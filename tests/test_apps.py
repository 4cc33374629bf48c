"""CLI app smoke tests (run in-process on tiny/synthetic inputs)."""

import os

import numpy as np
import pytest

from multi_frame_super_resolution_tpu.apps import polar_defog as polar_app
from multi_frame_super_resolution_tpu.apps import multi_frame_sr as sr_app


def test_polar_defog_usage():
    assert polar_app.main([]) == -1


def test_multi_frame_sr_usage():
    assert sr_app.main(["onlyone"]) == -1


def test_polar_defog_synthetic_debug(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert polar_app.main(["1", "3", "1.55"]) == 0
    assert os.path.exists(tmp_path / "R_gpu.png")
    assert os.path.exists(tmp_path / "polar_defog_debug.npz")
    dbg = np.load(tmp_path / "polar_defog_debug.npz")
    assert np.isfinite(dbg["R"]).all()
    assert dbg["t"].min() >= 0.001 and dbg["t"].max() <= 0.999


def test_load_inputs_bad_type():
    with pytest.raises(ValueError):
        polar_app._load_inputs(9)


def _fake_burst(monkeypatch, n=3, h=48, w=64):
    """Route load_burst to a small synthetic burst so the full CLI code
    path (arg parsing -> pipeline -> timing protocol -> file output)
    runs in seconds on CPU."""
    from multi_frame_super_resolution_tpu.data import synthetic_burst

    g, _ = synthetic_burst(
        np.random.default_rng(0), num_frames=n, height=h, width=w, max_shift=2.0
    )
    burst = np.stack([g] * 3, axis=-1)
    monkeypatch.setattr(
        "multi_frame_super_resolution_tpu.data.load_burst",
        lambda name: burst,
    )
    return burst


def test_multi_frame_sr_end_to_end(tmp_path, monkeypatch):
    """The flagship CLI's success path (multi_frame_sr.cpp:122-210):
    cyclic BTV-L1 over the burst, FPS protocol, sr + sharpened outputs."""
    _fake_burst(monkeypatch)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("MFSR_SR_CYCLES", "2")
    assert sr_app.main(["pyrlk", "city", "1"]) == 0
    for suffix in ("sr_result", "sr2_result"):
        p = tmp_path / f"city_pyrlk_{suffix}.png"
        assert p.exists()
        from multi_frame_super_resolution_tpu.data import imread

        img = imread(str(p))
        assert img.shape[:2] == (96, 128) and np.isfinite(img).all()


def test_handheld_sr_app_end_to_end(tmp_path, monkeypatch):
    from multi_frame_super_resolution_tpu.apps import handheld_sr as hh_app

    _fake_burst(monkeypatch, n=3, h=48, w=64)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("MFSR_BENCH_WARMUP", "1")
    monkeypatch.setenv("MFSR_BENCH_ITERS", "1")
    monkeypatch.setenv("MFSR_BENCH_K", "2")
    monkeypatch.setenv("MFSR_BENCH_REPS", "1")
    assert hh_app.main(["city", "2"]) == 0
    p = tmp_path / "city_handheld_sr.png"
    assert p.exists()
    from multi_frame_super_resolution_tpu.data import imread

    img = imread(str(p))
    assert img.shape[:2] == (96, 128) and np.isfinite(img).all()

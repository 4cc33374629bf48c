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

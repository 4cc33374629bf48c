import numpy as np
import pytest

from multi_frame_super_resolution_tpu.data import (
    imread,
    imwrite,
    load_burst,
    mosaic_rggb,
    synthetic_burst,
)


def test_synthetic_burst_shapes(rng):
    burst, shifts = synthetic_burst(rng, num_frames=4, height=64, width=96, max_shift=2.0)
    assert burst.shape == (4, 64, 96)
    assert shifts.shape == (4, 2)
    assert np.all(shifts[0] == 0)
    assert burst.dtype == np.float32
    assert np.isfinite(burst).all()


def test_synthetic_burst_shift_consistency(rng):
    # frame f sampled at +shift should roughly equal frame 0 (interior)
    burst, shifts = synthetic_burst(rng, num_frames=2, height=64, width=64, max_shift=3.0)
    dy, dx = shifts[1]
    iy, ix = int(round(dy)), int(round(dx))
    a = burst[0, 16:48, 16:48]
    b = burst[1, 16 - iy : 48 - iy, 16 - ix : 48 - ix]
    # integer-rounded alignment: correlation should be high
    err = np.abs(a - b).mean()
    assert err < 0.05


def test_mosaic_roundtrip_sites(rng):
    rgb = rng.random((8, 10, 3)).astype(np.float32)
    raw = mosaic_rggb(rgb)
    assert raw[0, 0] == rgb[0, 0, 0]  # R
    assert raw[0, 1] == rgb[0, 1, 1]  # G
    assert raw[1, 0] == rgb[1, 0, 1]  # G
    assert raw[1, 1] == rgb[1, 1, 2]  # B


def test_imwrite_imread_roundtrip(tmp_path, rng):
    img = rng.random((16, 24, 3)).astype(np.float32)
    path = tmp_path / "x.png"
    imwrite(path, img)
    back = imread(path)
    assert back.shape == img.shape
    assert np.abs(back - img).max() < 1 / 255.0 + 1e-6


@pytest.mark.parametrize("name,frames", [("city", 5), ("car", 4), ("iso", 4)])
def test_load_reference_bursts(name, frames):
    import os

    if not os.path.exists("/root/reference"):
        pytest.skip("reference data not available")
    burst = load_burst(name)
    assert burst.shape[0] == frames
    assert burst.ndim == 4 and burst.shape[-1] == 3
    assert burst.max() <= 1.0 and burst.min() >= 0.0

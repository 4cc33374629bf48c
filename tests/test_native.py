"""Native C++ loader parity vs PIL (skipped when the library can't build)."""

import os

import numpy as np
import pytest
from PIL import Image

from multi_frame_super_resolution_tpu.data import native


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@requires_native
def test_probe_and_decode_png(tmp_path, rng):
    arr = (rng.random((20, 30, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    assert native.probe(str(p)) == (20, 30, 3, 8)
    out = native.imread_native(str(p))
    np.testing.assert_allclose(out, arr.astype(np.float32) / 255.0, atol=1e-6)


@requires_native
def test_decode_png16(tmp_path, rng):
    arr = (rng.random((10, 12)) * 65535).astype(np.uint16)
    p = tmp_path / "x16.png"
    Image.fromarray(arr).save(p)
    h, w, c, bd = native.probe(str(p))
    assert (h, w, c, bd) == (10, 12, 1, 16)
    out = native.imread_native(str(p))
    expect = arr.astype(np.float32) / 65535.0
    np.testing.assert_allclose(out[..., 0], expect, atol=1e-6)
    # gray request applies luma of replicated channels == original
    gray = native.imread_native(str(p), gray=True)
    np.testing.assert_allclose(gray, expect, atol=1e-5)


@requires_native
def test_decode_jpeg_close_to_pil(tmp_path, rng):
    arr = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, quality=95)
    out = native.imread_native(str(p))
    with Image.open(p) as im:
        pil = np.asarray(im.convert("RGB"), np.float32) / 255.0
    # independent decoders; JPEG spec tolerance
    assert np.abs(out - pil).mean() < 0.01


@requires_native
def test_burst_load_matches_single(tmp_path, rng):
    paths = []
    arrs = []
    for i in range(3):
        arr = (rng.random((16, 18, 3)) * 255).astype(np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
        arrs.append(arr)
    burst = native.read_burst_native(paths)
    assert burst.shape == (3, 16, 18, 3)
    for i, arr in enumerate(arrs):
        np.testing.assert_allclose(burst[i], arr.astype(np.float32) / 255.0, atol=1e-6)


@requires_native
def test_burst_load_shape_mismatch_returns_none(tmp_path, rng):
    p1 = tmp_path / "a.png"
    p2 = tmp_path / "b.png"
    Image.fromarray((rng.random((8, 8, 3)) * 255).astype(np.uint8)).save(p1)
    Image.fromarray((rng.random((9, 8, 3)) * 255).astype(np.uint8)).save(p2)
    assert native.read_burst_native([str(p1), str(p2)]) is None


@requires_native
def test_read_raw_u16(tmp_path, rng):
    data = (rng.random((6, 8)) * 65535).astype("<u2")
    p = tmp_path / "x.raw"
    with open(p, "wb") as f:
        f.write(b"HDR!")  # 4-byte header
        f.write(data.tobytes())
    out = native.read_raw_u16(str(p), 6, 8, offset=4)
    np.testing.assert_allclose(out, data.astype(np.float32) / 65535.0, atol=1e-6)


@requires_native
def test_missing_file():
    assert native.imread_native("/nonexistent/file.png") is None


@requires_native
def test_reference_burst_native_matches_pil():
    if not os.path.exists("/root/reference"):
        pytest.skip("no reference data")
    from multi_frame_super_resolution_tpu.data import burst_paths

    paths = burst_paths("city")
    burst = native.read_burst_native(paths)
    with Image.open(paths[0]) as im:
        pil = np.asarray(im.convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(burst[0], pil, atol=1e-6)


@requires_native
def test_tiff16_gray_roundtrip(tmp_path, rng):
    """polar_defog's input format: 16-bit TIFF decoded natively
    (polar_defog.cpp:80-81; native/mfsr_native.cpp::decode_tiff)."""
    data = (rng.random((37, 53)) * 65535).astype(np.uint16)
    p = tmp_path / "d.tiff"
    Image.fromarray(data).save(p)
    assert native.probe(str(p)) == (37, 53, 1, 16)
    out = native.imread_native(str(p), gray=True)
    np.testing.assert_allclose(out, data.astype(np.float32) / 65535.0, atol=1e-6)


@requires_native
def test_tiff8_rgb_roundtrip(tmp_path, rng):
    data = (rng.random((21, 33, 3)) * 255).astype(np.uint8)
    p = tmp_path / "c.tif"
    Image.fromarray(data).save(p)
    assert native.probe(str(p)) == (21, 33, 3, 8)
    out = native.imread_native(str(p))
    np.testing.assert_allclose(out, data.astype(np.float32) / 255.0, atol=1e-6)


@requires_native
def test_imread_u16_uses_native_tiff(tmp_path, rng):
    from multi_frame_super_resolution_tpu.data import imread_u16

    data = (rng.random((16, 24)) * 65535).astype(np.uint16)
    p = tmp_path / "u.tiff"
    Image.fromarray(data).save(p)
    out = imread_u16(p)
    np.testing.assert_allclose(out, data.astype(np.float32) / 65535.0, atol=1e-6)

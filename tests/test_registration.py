import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_frame_super_resolution_tpu.config import AlignConfig, LKConfig, RegistrationConfig
from multi_frame_super_resolution_tpu.data import synthetic_burst
from multi_frame_super_resolution_tpu.ops.geometry import translate, rotate
from multi_frame_super_resolution_tpu.registration import (
    align_burst,
    align_pair,
    extract_ref_tiles,
    extract_search_windows,
    find_min_shift,
    flow_from_tile_shifts,
    lk_refine,
    phase_correlate,
    pyrlk_flow,
    quadratic_subpixel_min,
    register_rotation_scale,
    register_similarity,
    register_translation,
    ssd_surface,
    upsample_shift_field,
)


def _burst(rng, n=2, h=96, w=128, max_shift=3.0):
    return synthetic_burst(rng, num_frames=n, height=h, width=w, max_shift=max_shift)


# ---------------- subpixel interpolation ----------------

def test_subpixel_quadratic_exact():
    """A sampled quadratic bowl min at (ty, tx) must be recovered exactly."""
    for ty, tx in [(0.3, -0.4), (0.0, 0.0), (-0.45, 0.2)]:
        ys, xs = np.meshgrid([-1, 0, 1], [-1, 0, 1], indexing="ij")
        patch = (ys - ty) ** 2 + (xs - tx) ** 2
        off = np.asarray(quadratic_subpixel_min(jnp.asarray(patch)))
        np.testing.assert_allclose(off, [ty, tx], atol=1e-5)


def test_subpixel_degenerate_flat():
    patch = jnp.ones((3, 3))
    off = np.asarray(quadratic_subpixel_min(patch))
    np.testing.assert_allclose(off, [0.0, 0.0])


# ---------------- phase correlation ----------------

def test_phase_correlate_integer_shift(rng):
    burst, _ = _burst(rng, n=1)
    img = jnp.asarray(burst[0])
    # circular shift: moved(x) = img(x + (4, -7)) exactly, no border leakage
    moved = jnp.roll(img, (-4, 7), axis=(0, 1))

    shift, peak = jax.jit(lambda a, b: phase_correlate(a, b, subpixel=False))(img, moved)
    np.testing.assert_allclose(np.asarray(shift), [4.0, -7.0], atol=0.01)
    assert float(peak) > 0.5


def test_phase_correlate_subpixel(rng):
    """Non-circular shifts need the apodization window (as the reference
    applies at main.cpp:955-963) to suppress boundary leakage."""
    from multi_frame_super_resolution_tpu.ops.fourier import apodization_window

    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])
    win = jnp.asarray(apodization_window(128, 128, 15))
    true = (1.3, -2.6)

    @jax.jit
    def run(img):
        moved = translate(img, *true)
        return phase_correlate(img, moved, subpixel=True, window=win)

    shift, _ = run(img)
    np.testing.assert_allclose(np.asarray(shift), true, atol=0.15)


# ---------------- tile SSD alignment ----------------

def test_ssd_surface_zero_at_true_shift(rng):
    burst, _ = _burst(rng, n=1, h=64, w=64)
    img = jnp.asarray(burst[0])
    moved = translate(img, 2.0, 1.0)
    ref_tiles = extract_ref_tiles(img, 16)
    windows = extract_search_windows(moved, 16, 4)
    ssd = np.asarray(ssd_surface(ref_tiles, windows, 4))
    # moved(x + s) = img(x + s + (2,1)); ref tile matches window at offset
    # u-R = -2, v-R = -1
    assert ssd.shape == (4, 4, 9, 9)
    interior = ssd[1:-1, 1:-1]
    amin = interior.reshape(2, 2, -1).argmin(-1)
    np.testing.assert_array_equal(amin // 9, np.full((2, 2), 4 - 2))
    np.testing.assert_array_equal(amin % 9, np.full((2, 2), 4 - 1))


def test_ssd_matches_naive(rng):
    ref = rng.random((2, 2, 8, 8)).astype(np.float32)
    win = rng.random((2, 2, 12, 12)).astype(np.float32)
    got = np.asarray(ssd_surface(jnp.asarray(ref), jnp.asarray(win), 2))
    for u in range(5):
        for v in range(5):
            patch = win[:, :, u : u + 8, v : v + 8]
            expect = ((ref - patch) ** 2).sum(axis=(-2, -1))
            np.testing.assert_allclose(got[:, :, u, v], expect, rtol=1e-4, atol=1e-4)


def test_phase_correlate_dft_refine_subpixel(rng):
    """Matrix-DFT local upsampling (_dft_refine_peak, the MXU finish of
    the refinement the reference left at main.cpp:840-850) locates the
    correlation peak to ~1/16 px. Use an exact CIRCULAR Fourier-domain
    shift so the surface's true peak coincides with the ground-truth
    shift (windowed open-boundary shifts bias the peak itself by
    ~0.1 px, which is a property of the surface, not the refinement)."""
    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])

    def circular_shift(im, dy, dx):
        f = jnp.fft.fft2(im)
        fy = jnp.fft.fftfreq(im.shape[0])[:, None]
        fx = jnp.fft.fftfreq(im.shape[1])[None, :]
        return jnp.real(
            jnp.fft.ifft2(f * jnp.exp(-2j * jnp.pi * (fy * dy + fx * dx)))
        )

    for true in [(1.3, -2.6), (-0.45, 0.2), (3.75, 3.25)]:
        moved = circular_shift(img, -true[0], -true[1])
        dft, _ = jax.jit(
            lambda a, b: phase_correlate(a, b, subpixel=True, refine=16)
        )(img, moved)
        err = np.abs(np.asarray(dft) - np.asarray(true)).max()
        assert err < 0.07, (true, np.asarray(dft), err)


def test_similarity_warp_fast_matches_remap(rng):
    """The gatherless two-pass one-hot warp must track the gather remap
    for similarity transforms across the supported envelope (rotations
    to ~17 deg with small scale/translation)."""
    from multi_frame_super_resolution_tpu.ops.filters import gaussian_blur

    img = np.asarray(
        gaussian_blur(jnp.asarray(rng.random((96, 160)).astype(np.float32)), 1.0)
    )
    for deg, s, (ty, tx) in [
        (0.0, 1.0, (3.3, -7.7)),
        (15.0, 1.02, (4.5, -2.5)),
        (-12.0, 0.98, (-3.0, 8.0)),
    ]:
        _check_similarity_warp(img, deg, s, ty, tx)


def test_similarity_warp_fast_wide_image_15deg(rng):
    """Wide images at 15 deg: the pass-1 stretch residual grows with the
    axis length (~10 px at width 512), so the residual clamp must scale
    with the image size — a fixed clamp of 8 misplaced the outer columns
    by up to 0.25 intensity on exactly this case (city RGB prealign)."""
    from multi_frame_super_resolution_tpu.ops.filters import gaussian_blur

    img = np.asarray(
        gaussian_blur(jnp.asarray(rng.random((256, 512)).astype(np.float32)), 1.0)
    )
    _check_similarity_warp(img, 15.0, 1.0, 2.0, -3.0)
    _check_similarity_warp(img, -15.0, 1.01, 0.0, 0.0)


def _check_similarity_warp(img, deg, s, ty, tx):
    import math

    from multi_frame_super_resolution_tpu.ops.geometry import remap
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        similarity_warp_fast,
    )

    h, w = img.shape
    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    th = math.radians(deg)
    ca, sa = math.cos(th), math.sin(th)
    yy = ys - ty - cy
    xx = xs - tx - cx
    src_y = ((sa * xx + ca * yy) * s + cy).astype(np.float32)
    src_x = ((ca * xx - sa * yy) * s + cx).astype(np.float32)
    ref = np.asarray(
        remap(jnp.asarray(img), jnp.asarray(src_y), jnp.asarray(src_x), "bilinear")
    )
    fast = np.asarray(
        jax.jit(similarity_warp_fast)(
            jnp.asarray(img), jnp.asarray(src_y), jnp.asarray(src_x)
        )
    )
    # compare where the source stays interior (border clamp semantics
    # agree but two-pass vs 2-D bilinear differ most at the rim)
    m = (src_y > 2) & (src_y < h - 3) & (src_x > 2) & (src_x < w - 3)
    d = np.abs(ref - fast)[m]
    if deg == 0.0:
        assert d.max() < 1e-5, d.max()  # pure translation: exact
    else:
        # rotated: both are valid resamplings of the same continuous
        # warp; they agree to interpolation tolerance
        assert np.sqrt((d**2).mean()) < 0.02, np.sqrt((d**2).mean())
        assert d.max() < 0.2, d.max()


def test_ssd_surface_fft_matches_direct(rng):
    """The FFT correlation route (kernel.cu:484-501 equivalent) must
    reproduce the direct MXU contraction's surface bit-for-tolerance."""
    from multi_frame_super_resolution_tpu.registration.tiles import (
        ssd_surface_fft,
    )

    for t, r in [(8, 2), (16, 4), (8, 6)]:
        ref = rng.random((3, 2, t, t)).astype(np.float32)
        win = rng.random((3, 2, t + 2 * r, t + 2 * r)).astype(np.float32)
        direct = np.asarray(ssd_surface(jnp.asarray(ref), jnp.asarray(win), r))
        fft = np.asarray(ssd_surface_fft(jnp.asarray(ref), jnp.asarray(win), r))
        np.testing.assert_allclose(fft, direct, rtol=2e-3, atol=2e-3)


def test_align_large_radius_fft_route(rng):
    """Radii beyond tile_size/2 (where the gatherless fast path cannot
    run) must still align through the FFT route — the capability envelope
    of the reference's FFT correlation alignment."""
    from multi_frame_super_resolution_tpu.registration.align import align_pair

    burst, _ = _burst(rng, n=1, h=96, w=96)
    img = jnp.asarray(burst[0])
    moved = translate(img, -9.0, 11.0)
    cfg = AlignConfig(tile_size=16, search_radius=12, levels=1, use_fft=True)
    shifts = np.asarray(jax.jit(lambda a, b: align_pair(a, b, cfg))(img, moved))
    inner = shifts[1:-1, 1:-1]
    np.testing.assert_allclose(inner[..., 0], 9.0, atol=0.35)
    np.testing.assert_allclose(inner[..., 1], -11.0, atol=0.35)


def test_find_min_shift_border_zeroed():
    ssd = np.ones((1, 1, 9, 9), np.float32)
    ssd[0, 0, 0, 0] = 0.0  # min on the border -> reference zeroes the shift
    out = np.asarray(find_min_shift(jnp.asarray(ssd), 4, threshold=0.0))
    np.testing.assert_allclose(out, 0.0)


def test_find_min_shift_significance_gate():
    ssd = np.ones((1, 1, 9, 9), np.float32)
    ssd[0, 0, 4, 6] = 0.9  # shallow minimum
    out = np.asarray(find_min_shift(jnp.asarray(ssd), 4, threshold=0.5))
    np.testing.assert_allclose(out, 0.0)  # 0.9 + 0.5 > 1.0 -> gated
    out2 = np.asarray(find_min_shift(jnp.asarray(ssd), 4, threshold=0.05))
    assert out2[0, 0, 1] == pytest.approx(2.0, abs=0.5)


def test_upsample_shift_field_scales_values():
    shifts = jnp.asarray(np.ones((2, 3, 2), np.float32))
    up = np.asarray(upsample_shift_field(shifts, 4, 6, 2.0))
    assert up.shape == (4, 6, 2)
    np.testing.assert_allclose(up, 2.0, atol=1e-6)


def test_align_pair_recovers_translation(rng):
    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])
    true = (2.4, -3.1)
    cfg = AlignConfig(tile_size=16, search_radius=4, levels=2)

    @jax.jit
    def run(img):
        moved = translate(img, *true)
        return align_pair(img, moved, cfg)

    shifts = np.asarray(run(img))
    # moved(x) = img(x + true), alignment finds d with moved(pos+d)=ref(pos)
    # => d = -true
    interior = shifts[2:-2, 2:-2]
    np.testing.assert_allclose(interior.mean(axis=(0, 1)), [-true[0], -true[1]], atol=0.1)
    assert np.abs(interior - interior.mean(axis=(0, 1))).max() < 0.3


def test_align_burst_reference_is_zero(rng):
    burst, true_shifts = _burst(rng, n=3, h=96, w=96, max_shift=2.5)
    cfg = AlignConfig(tile_size=16, search_radius=4, levels=2)
    shifts = np.asarray(jax.jit(lambda b: align_burst(b, cfg))(jnp.asarray(burst)))
    np.testing.assert_allclose(shifts[0], 0.0)
    # frame f was sampled at base(x + s_f): frame(x) = ref(x + s_f), so the
    # estimated per-tile shift d (with frame(pos + d) = ref(pos)) is -s_f
    for f in range(1, 3):
        est = shifts[f, 1:-1, 1:-1].mean(axis=(0, 1))
        np.testing.assert_allclose(est, -true_shifts[f], atol=0.2)


def test_flow_from_tile_shifts_shape():
    shifts = jnp.asarray(np.ones((4, 6, 2), np.float32))
    flow = flow_from_tile_shifts(shifts, 16, 64, 96)
    assert flow.shape == (64, 96, 2)
    np.testing.assert_allclose(np.asarray(flow), 1.0, atol=1e-5)


# ---------------- Lucas-Kanade ----------------

def test_lk_refine_small_shift(rng):
    burst, _ = _burst(rng, n=1, h=96, w=96)
    img = jnp.asarray(burst[0])
    true = (0.6, -0.4)
    moved = translate(img, -true[0], -true[1])
    # moved(x) = img(x - true) => moved(x + true) = img(x): LK should find
    # flow ~= true so warp_backward(moved, flow) == img
    flow0 = jnp.zeros((96, 96, 2))
    flow = np.asarray(jax.jit(lambda a, b, f: lk_refine(a, b, f, LKConfig(half_window=4, iterations=5)))(img, moved, flow0))
    est = flow[16:-16, 16:-16].mean(axis=(0, 1))
    np.testing.assert_allclose(est, true, atol=0.15)


def test_pyrlk_flow_larger_shift(rng):
    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])
    true = (3.0, -2.0)
    moved = translate(img, -true[0], -true[1])
    flow = np.asarray(jax.jit(pyrlk_flow)(img, moved))
    est = flow[24:-24, 24:-24].mean(axis=(0, 1))
    np.testing.assert_allclose(est, true, atol=0.4)


# ---------------- log-polar registration ----------------

def test_register_translation(rng):
    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])
    moved = translate(img, 5.2, -3.4)
    shift, _ = jax.jit(register_translation)(img, moved)
    np.testing.assert_allclose(np.asarray(shift), [5.2, -3.4], atol=0.3)


def test_register_rotation_scale(rng):
    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])
    true_rot = 0.12
    moved = rotate(img, true_rot, method="bilinear")
    rot, scale, _ = jax.jit(register_rotation_scale)(img, moved)
    assert abs(float(scale) - 1.0) < 0.05
    # SIGNED convention: the returned rotation is the angle of the
    # unrotate map that brings `moved` back onto `img` (= -true)
    assert abs(float(rot) + true_rot) < 0.03


def test_register_rotation_scale_nonsquare(rng):
    """Non-square frames: the spectrum must be sampled in isotropic
    normalized frequency or the angle axis is warped by the aspect ratio
    (the 256x512 city frames estimated -theta/2 before the fix)."""
    burst, _ = _burst(rng, n=1, h=64, w=128)
    img = jnp.asarray(burst[0])
    for true_rot in (0.1, -0.2):
        moved = rotate(img, true_rot, method="bilinear")
        rot, scale, _ = jax.jit(register_rotation_scale)(img, moved)
        assert abs(float(scale) - 1.0) < 0.05, float(scale)
        assert abs(float(rot) + true_rot) < 0.04, (float(rot), true_rot)


def test_register_similarity_end_to_end(rng):
    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])
    moved = translate(rotate(img, 0.1, method="bilinear"), 3.0, -2.0)
    tf = register_similarity(img, moved)
    assert abs(float(tf.rotation) + 0.1) < 0.04
    assert abs(float(tf.scale) - 1.0) < 0.05


def test_prealign_burst_recovers_rotated_frame(rng):
    """prealign_burst must bring a rotated+shifted alternate back into
    reference geometry (the city burst's 5-15 degree frames,
    main.cpp:1896; baseRotation tile model kernel.cu:264-318)."""
    from multi_frame_super_resolution_tpu.registration.prealign import (
        prealign_burst,
    )

    burst, _ = _burst(rng, n=1, h=128, w=128)
    img = jnp.asarray(burst[0])
    moved = translate(rotate(img, 0.15, method="bilinear"), 2.0, -3.0)
    stack = jnp.stack([img, moved])
    out, valid = jax.jit(
        lambda b: prealign_burst(b, b, with_translation=True)
    )(stack)
    m = 24
    inner = (slice(m, -m), slice(m, -m))
    before = float(jnp.abs(moved - img)[inner].mean())
    after = float(jnp.abs(out[1] - img)[inner].mean())
    assert after < 0.35 * before, (before, after)
    assert float(valid[1][inner].mean()) > 0.9


def test_align_burst_consistent_matches_direct(rng):
    from multi_frame_super_resolution_tpu.registration.align import (
        align_burst_consistent,
    )

    burst, true_shifts = _burst(rng, n=4, h=96, w=96, max_shift=2.0)
    cfg = AlignConfig(tile_size=16, search_radius=4, levels=2)
    shifts = np.asarray(
        jax.jit(lambda b: align_burst_consistent(b, cfg))(jnp.asarray(burst))
    )
    np.testing.assert_allclose(shifts[0], 0.0, atol=1e-5)
    for f in range(1, 4):
        est = shifts[f, 1:-1, 1:-1].mean(axis=(0, 1))
        np.testing.assert_allclose(est, -true_shifts[f], atol=0.25)

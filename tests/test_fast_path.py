"""Parity tests: gatherless fast path vs gather-based oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
from multi_frame_super_resolution_tpu.data import synthetic_burst
from multi_frame_super_resolution_tpu.models import handheld_superres
from multi_frame_super_resolution_tpu.models.fast_merge import merge_burst_fast
from multi_frame_super_resolution_tpu.models.merge import merge_burst_rgb
from multi_frame_super_resolution_tpu.ops.geometry import resize, translate, warp_backward
from multi_frame_super_resolution_tpu.ops.warp_fast import (
    tile_shift_decompose,
    tile_warp_int,
    upsample_int,
    warp_bounded,
)
from multi_frame_super_resolution_tpu.utils import psnr


def test_upsample_int_matches_resize_bilinear(rng):
    img = rng.random((16, 24, 3)).astype(np.float32)
    a = np.asarray(upsample_int(jnp.asarray(img), 2, "bilinear"))
    b = np.asarray(resize(jnp.asarray(img), 32, 48, "bilinear"))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_upsample_int_matches_resize_bicubic(rng):
    img = rng.random((16, 24)).astype(np.float32)
    a = np.asarray(upsample_int(jnp.asarray(img), 2, "bicubic"))
    b = np.asarray(resize(jnp.asarray(img), 32, 48, "bicubic"))
    # border rows differ (edge-clamp order); compare interior
    np.testing.assert_allclose(a[4:-4, 4:-4], b[4:-4, 4:-4], atol=1e-5)


def test_upsample_int_scale3(rng):
    img = rng.random((8, 8)).astype(np.float32)
    a = np.asarray(upsample_int(jnp.asarray(img), 3, "bilinear"))
    b = np.asarray(resize(jnp.asarray(img), 24, 24, "bilinear"))
    np.testing.assert_allclose(a[3:-3, 3:-3], b[3:-3, 3:-3], atol=1e-5)


def test_warp_bounded_matches_gather_warp(rng):
    img = rng.random((24, 24)).astype(np.float32)
    flow = rng.uniform(-1.5, 1.5, (24, 24, 2)).astype(np.float32)
    a = np.asarray(warp_bounded(jnp.asarray(img), jnp.asarray(flow), r=2))
    b = np.asarray(warp_backward(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(a[3:-3, 3:-3], b[3:-3, 3:-3], atol=1e-5)


def test_tile_warp_int_constant_shift(rng):
    img = rng.random((32, 32)).astype(np.float32)
    shifts = np.tile(np.asarray([2, -3], np.int32), (2, 2, 1))
    out = np.asarray(tile_warp_int(jnp.asarray(img), jnp.asarray(shifts), 16))
    expect = np.asarray(
        translate(jnp.asarray(img), 2.0, -3.0, method="nearest")
    )
    np.testing.assert_allclose(out, expect)


def test_tile_warp_int_per_tile(rng):
    img = rng.random((32, 32)).astype(np.float32)
    shifts = np.zeros((2, 2, 2), np.int32)
    shifts[0, 0] = (1, 0)
    shifts[1, 1] = (0, -2)
    out = np.asarray(tile_warp_int(jnp.asarray(img), jnp.asarray(shifts), 16))
    # tile (0,0): shifted down-read by 1
    np.testing.assert_allclose(out[:15, :16], img[1:16, :16])
    # tile (0,1): identity
    np.testing.assert_allclose(out[:16, 16:], img[:16, 16:])
    # tile (1,1): x-shift -2 (clamped at x=16,17 -> reads img[:, 14:])
    np.testing.assert_allclose(out[16:, 18:], img[16:, 16:30])


def test_tile_shift_decompose():
    shifts = jnp.asarray([[[1.4, -2.6]]])
    ints, res = tile_shift_decompose(shifts)
    np.testing.assert_allclose(np.asarray(ints), [[[1, -3]]])
    np.testing.assert_allclose(np.asarray(res), [[[0.4, 0.4]]], atol=1e-6)
    assert np.abs(np.asarray(res)).max() <= 0.5 + 1e-6


def test_merge_fast_matches_oracle_constant_flow(rng):
    """With a constant bounded flow both merges sample the same taps;
    outputs must agree in the interior."""
    img = rng.random((16, 16, 3)).astype(np.float32)
    burst = jnp.asarray(np.stack([img] * 3))
    flow_val = np.asarray([0.3, -0.2], np.float32)
    flows = jnp.broadcast_to(flow_val, (3, 16, 16, 2))
    cert = jnp.ones((3, 16, 16, 3))
    omega = jnp.tile(jnp.asarray([4.0, 4.0, 0.0]), (16, 16, 1))

    num_o, den_o = merge_burst_rgb(burst, flows, cert, omega, scale=2, radius=2)
    num_f, den_f = merge_burst_fast(
        burst, flows, cert, omega, scale=2, radius=2, residual_bound=1.0
    )
    out_o = np.asarray(num_o / den_o)
    out_f = np.asarray(num_f / den_f)
    p = float(psnr(jnp.asarray(out_o[8:-8, 8:-8]), jnp.asarray(out_f[8:-8, 8:-8])))
    assert p > 40.0, p


def test_handheld_fast_close_to_oracle(rng):
    # fast-path quality on synthetic bursts is covered by
    # tests/test_handheld.py (fast=True is the default config there);
    # this file pins fast-vs-oracle parity only.
    burst, _ = synthetic_burst(rng, num_frames=3, height=64, width=64, max_shift=2.0)
    rgb = jnp.asarray(np.stack([burst] * 3, axis=-1))
    align = AlignConfig(tile_size=16, search_radius=4, levels=2)
    fast = jax.jit(
        lambda b: handheld_superres(b, HandheldConfig(align=align, fast=True, prealign=False))
    )(rgb)
    slow = jax.jit(
        lambda b: handheld_superres(b, HandheldConfig(align=align, fast=False, prealign=False))
    )(rgb)
    p = float(psnr(slow[8:-8, 8:-8], fast[8:-8, 8:-8]))
    assert p > 25.0, p


def test_decompose_flow_roundtrip(rng):
    from multi_frame_super_resolution_tpu.ops.warp_fast import decompose_flow

    # smooth flow: tile mean + small residual reconstructs exactly
    base = np.asarray([3.2, -5.7], np.float32)
    wobble = rng.uniform(-0.4, 0.4, (32, 32, 2)).astype(np.float32)
    flow = jnp.asarray(base + wobble)
    tile_int, res = decompose_flow(flow, 16)
    assert tile_int.dtype == jnp.int32
    lifted = np.repeat(np.repeat(np.asarray(tile_int), 16, 0), 16, 1)
    np.testing.assert_allclose(lifted + np.asarray(res), np.asarray(flow), atol=1e-6)
    assert np.abs(np.asarray(res)).max() < 1.0


def test_warp_decomposed_matches_gather(rng):
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        decompose_flow,
        warp_decomposed,
    )

    img = jnp.asarray(rng.random((64, 64)).astype(np.float32))
    flow = jnp.asarray(
        np.asarray([2.3, -1.6], np.float32)
        + rng.uniform(-0.5, 0.5, (64, 64, 2)).astype(np.float32)
    )
    tile_int, res = decompose_flow(flow, 16)
    a = np.asarray(warp_decomposed(img, tile_int, res, 16, 2))
    b = np.asarray(warp_backward(img, flow))
    np.testing.assert_allclose(a[8:-8, 8:-8], b[8:-8, 8:-8], atol=1e-5)


def test_btvl1_fast_matches_slow(rng):
    from multi_frame_super_resolution_tpu.config import BTVConfig
    from multi_frame_super_resolution_tpu.models import btvl1_superres

    burst, _ = synthetic_burst(rng, num_frames=3, height=32, width=32, max_shift=1.5)
    b = jnp.asarray(burst)
    fast = jax.jit(
        lambda x: btvl1_superres(x, 0, BTVConfig(iterations=5, fast=True))
    )(b)
    slow = jax.jit(
        lambda x: btvl1_superres(x, 0, BTVConfig(iterations=5, fast=False))
    )(b)
    p = float(psnr(slow[4:-4, 4:-4], fast[4:-4, 4:-4]))
    assert p > 35.0, p


def test_tile_warp_matmul_exact_separable(rng):
    """The banded MXU selector-matmul warp equals the EXACT separable
    per-tile semantics out[y, x] = img[clamp(y+sy), clamp(x+sx)] for
    batched planes sharing one shift field — including non-tile-multiple
    sizes, border clamps, and bounds where tile_warp_select's two-level
    one-hot decomposition mis-warps tile-crossing bands (its documented
    approximation; the matmul form has no such band)."""
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        tile_warp_matmul,
        tile_warp_select,
    )

    for (h, w, t, bound) in (
        (32, 48, 16, 8),
        (40, 56, 16, 16),
        (32, 32, 8, 6),
    ):
        imgs = rng.random((3, h, w)).astype(np.float32)
        shifts = rng.integers(
            -bound, bound + 1, (-(-h // t), -(-w // t), 2)
        ).astype(np.int32)
        got = np.asarray(
            tile_warp_matmul(
                jnp.asarray(imgs), jnp.asarray(shifts), t, bound=bound,
                precision="highest",
            )
        )
        sy = np.repeat(np.repeat(shifts[..., 0], t, 0), t, 1)[:h, :w]
        sx = np.repeat(np.repeat(shifts[..., 1], t, 0), t, 1)[:h, :w]
        y1 = imgs[
            :, np.clip(np.arange(h)[:, None] + sy, 0, h - 1),
            np.arange(w)[None, :],
        ]
        want = y1[
            :, np.arange(h)[:, None],
            np.clip(np.arange(w)[None, :] + sx, 0, w - 1),
        ]
        np.testing.assert_allclose(got, want, atol=1e-6)
        if bound <= 6:
            # direct one-hot path: select and matmul coincide exactly
            sel = np.stack(
                [
                    np.asarray(
                        tile_warp_select(
                            jnp.asarray(imgs[i]), jnp.asarray(shifts), t,
                            bound=bound,
                        )
                    )
                    for i in range(3)
                ]
            )
            np.testing.assert_allclose(got, sel, atol=1e-6)


def test_tile_warp_select_uniform_exact(rng):
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        tile_warp_select,
    )

    img = jnp.asarray(rng.random((32, 48)).astype(np.float32))
    shifts = jnp.asarray(np.tile(np.asarray([5, -7], np.int32), (2, 3, 1)))
    a = np.asarray(tile_warp_select(img, shifts, 16, bound=16))
    b = np.asarray(tile_warp_int(img, shifts, 16))
    np.testing.assert_allclose(a, b)


def test_tile_warp_select_rgb_and_varying(rng):
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        tile_warp_select,
    )

    img = jnp.asarray(rng.random((32, 48, 3)).astype(np.float32))
    shifts = jnp.asarray(rng.integers(-3, 4, (2, 3, 2)).astype(np.int32))
    a = np.asarray(tile_warp_select(img, shifts, 16, bound=8))
    b = np.asarray(
        jnp.stack(
            [tile_warp_int(img[..., c], shifts, 16) for c in range(3)], axis=-1
        )
    )
    # exact away from tile-crossing bands; tile interiors match
    for ty in range(2):
        for tx in range(3):
            ys, xs = ty * 16, tx * 16
            sy, sx = int(shifts[ty, tx, 0]), int(shifts[ty, tx, 1])
            # interior of each tile where neither pass crosses a boundary
            y0, y1 = ys + max(-sy, 0) + 4, ys + 16 - max(sy, 0) - 4
            x0, x1 = xs + max(-sx, 0) + 4, xs + 16 - max(sx, 0) - 4
            if y1 > y0 and x1 > x0:
                np.testing.assert_allclose(
                    a[y0:y1, x0:x1], b[y0:y1, x0:x1], atol=1e-6
                )


def test_handheld_raw_fast_close_to_oracle(rng):
    from multi_frame_super_resolution_tpu.data import mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw

    burst, _ = synthetic_burst(rng, num_frames=3, height=64, width=64, max_shift=2.0)
    rgb = np.stack([burst] * 3, axis=-1)
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in rgb]))
    align = AlignConfig(tile_size=8, search_radius=4, levels=2)
    fast = jax.jit(
        lambda b: handheld_superres_raw(
            b, HandheldConfig(align=align, fast=True, gamma=False, prealign=False)
        )
    )(raw)
    slow = jax.jit(
        lambda b: handheld_superres_raw(
            b, HandheldConfig(align=align, fast=False, gamma=False, prealign=False)
        )
    )(raw)
    p = float(psnr(slow[8:-8, 8:-8], fast[8:-8, 8:-8]))
    assert p > 24.0, p
    assert np.isfinite(np.asarray(fast)).all()


def _merge_raw_oracle_np(raw_warped, res_raw, cert_raw, omega, omega_rb, cfa,
                         s, taps, rb):
    """Independent full-resolution NumPy oracle of the CFA-masked
    static-tap merge semantics (weights from the per-pixel residual at
    the OUTPUT pixel; each sample contributes to its own CFA channel;
    green uses `omega`, R/B use `omega_rb`)."""
    from multi_frame_super_resolution_tpu.ops.debayer import cfa_channel_map

    f, h, w = raw_warped.shape
    phi = (np.arange(s) + 0.5) / s - 0.5
    chan = np.asarray(cfa_channel_map(h, w, cfa))
    eye3 = np.eye(3, dtype=np.float32)

    def shiftc(img, ky, kx):
        ys = np.clip(np.arange(h) + ky, 0, h - 1)
        xs = np.clip(np.arange(w) + kx, 0, w - 1)
        return img[np.ix_(ys, xs)]

    num = np.zeros((s, s, h, w, 3), np.float32)
    den = np.zeros((s, s, h, w, 3), np.float32)
    for fi in range(f):
        ry = np.clip(res_raw[fi, ..., 0], -rb, rb)
        rx = np.clip(res_raw[fi, ..., 1], -rb, rb)
        for ky, kx in taps:
            val = shiftc(raw_warped[fi], ky, kx)
            certk = shiftc(cert_raw[fi], ky, kx)
            ch = shiftc(chan, ky, kx)
            onehot = eye3[ch]
            for py in range(s):
                dy = (ky - ry) * s - phi[py] * s
                for px in range(s):
                    dx = (kx - rx) * s - phi[px] * s

                    def quad(om):
                        return np.exp(
                            -0.5 * (dx * dx * om[..., 0] + dy * dy * om[..., 1]
                                    + 2.0 * dx * dy * om[..., 2]))

                    wsel = np.where(ch == 1, quad(omega), quad(omega_rb))
                    cw = wsel[..., None] * certk * onehot
                    num[py, px] += val[..., None] * cw
                    den[py, px] += cw
    sh, sw = h * s, w * s
    return (num.transpose(2, 0, 3, 1, 4).reshape(sh, sw, 3),
            den.transpose(2, 0, 3, 1, 4).reshape(sh, sw, 3))


def test_merge_raw_planes_matches_fullres_oracle(rng):
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        _active_taps,
        merge_burst_raw_planes,
        raw_to_planes,
    )

    f, h, w, s = 3, 24, 32, 2
    hh, hw = h // 2, w // 2
    cfa = ((0, 1), (1, 2))
    raw = rng.random((f, h, w)).astype(np.float32)
    res_half = (rng.random((f, hh, hw, 2)).astype(np.float32) - 0.5) * 2.0
    cert_half = rng.random((f, hh, hw, 3)).astype(np.float32)
    om_half = np.stack(
        [0.5 + rng.random((hh, hw)), 0.5 + rng.random((hh, hw)),
         0.1 * (rng.random((hh, hw)) - 0.5)], axis=-1).astype(np.float32)
    om_rb_half = np.broadcast_to(
        np.asarray([1.0, 1.0, 0.0], np.float32), (hh, hw, 3)).copy()

    rb, radius = 1.0, 2
    taps = _active_taps(radius + 1, rb, s, k_max=1.0)
    assert len(taps) == 25  # pruned exactly to the reference 5x5

    num_p, den_p = merge_burst_raw_planes(
        raw_to_planes(jnp.asarray(raw)), jnp.asarray(res_half),
        jnp.asarray(cert_half), jnp.asarray(om_half), jnp.asarray(om_rb_half),
        cfa, s, radius, residual_bound=rb, k_max=1.0)

    up = lambda a: np.repeat(np.repeat(a, 2, axis=-3 if a.ndim > 3 else 0),
                             2, axis=-2 if a.ndim > 3 else 1)
    res_raw = np.repeat(np.repeat(res_half, 2, axis=1), 2, axis=2)
    cert_raw = np.repeat(np.repeat(cert_half, 2, axis=1), 2, axis=2)
    om = np.repeat(np.repeat(om_half, 2, axis=0), 2, axis=1)
    om_rb = np.repeat(np.repeat(om_rb_half, 2, axis=0), 2, axis=1)
    num_o, den_o = _merge_raw_oracle_np(
        raw, res_raw, cert_raw, om, om_rb, cfa, s, taps, rb)

    m = 2 * (radius + 1) * s  # border band where clamp semantics differ
    np.testing.assert_allclose(
        np.asarray(num_p)[m:-m, m:-m], num_o[m:-m, m:-m], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(den_p)[m:-m, m:-m], den_o[m:-m, m:-m], rtol=2e-5, atol=2e-5)


def test_raw_planes_roundtrip(rng):
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        planes_to_raw,
        raw_to_planes,
    )

    raw = rng.random((3, 8, 12)).astype(np.float32)
    planes = raw_to_planes(jnp.asarray(raw))
    assert planes.shape == (3, 2, 2, 4, 6)
    np.testing.assert_array_equal(np.asarray(planes[:, 1, 0]), raw[:, 1::2, 0::2])
    np.testing.assert_array_equal(np.asarray(planes_to_raw(planes)), raw)

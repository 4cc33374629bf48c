"""Pallas tile-block gather: per-tile shifted blocks with halo via DMA.

RETIRED from the production pipeline (round 4): Mosaic rejects the
(t + 2R)-wide per-tile DMA slices ("slice shape along dimension 2 must
be aligned to tiling (128), but is 24" — probe re-run on real v5e,
2026-08-19). Interpret-mode research artifact only; the production
window path is align.py's fused tile-warp + ssd_surface_image. See
BENCH_NOTES.md "Pallas verdict (round 4)".

The TPU-native convertToTilesOverlapPreShift (kernel.cu:323-378): for
each alignment tile, DMA the block ``img[tile_origin + shift - pad ...]``
(halo pad = search radius) into its own output slot, with per-tile shifts
scalar-prefetched — no XLA gather.

Layout: one grid step per (image, tile-row); the output row block is
(block, ntx*block) so the VMEM block is lane-aligned; the result is
reshaped to (..., nty, ntx, block, block) outside.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(block: int, ntx: int):
    def kernel(oy_ref, ox_ref, img_ref, out_ref, sems):
        n = pl.program_id(0)
        ty = pl.program_id(1)
        h = img_ref.shape[1]
        w = img_ref.shape[2]

        copies = []
        for tx in range(ntx):
            y0 = jnp.clip(oy_ref[n, ty, tx], 0, h - block)
            x0 = jnp.clip(ox_ref[n, ty, tx], 0, w - block)
            copy = pltpu.make_async_copy(
                img_ref.at[n, pl.ds(y0, block), pl.ds(x0, block)],
                out_ref.at[0, 0, :, pl.ds(tx * block, block)],
                sems.at[tx],
            )
            copy.start()
            copies.append(copy)
        for copy in copies:
            copy.wait()

    return kernel


def tile_gather_pallas(
    imgs: jnp.ndarray,
    int_shifts: jnp.ndarray,
    tile_size: int,
    pad: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, H, W) images -> (N, nty, ntx, T+2p, T+2p) shifted blocks.

    Block (n, ty, tx) covers imgs[n, ty*T - p + sy : ... + T + p, ...]
    with the block origin clamped in bounds (border tiles replicate
    interior rows like the reference's clamped reads, approximated at
    block granularity). int_shifts: (N, nty, ntx, 2) int32.
    """
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
        int_shifts = int_shifts[None]
    n, h, w = imgs.shape
    t = tile_size
    nty, ntx = -(-h // t), -(-w // t)
    block = t + 2 * pad
    if h < block or w < block:
        raise ValueError("image smaller than one padded block")

    oy = jnp.arange(nty, dtype=jnp.int32)[None, :, None] * t - pad + int_shifts[..., 0]
    ox = jnp.arange(ntx, dtype=jnp.int32)[None, None, :] * t - pad + int_shifts[..., 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n, nty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, block, ntx * block),
            lambda ni, ty, oy, ox: (ni, ty, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((ntx,))],
    )
    out = pl.pallas_call(
        _make_kernel(block, ntx),
        out_shape=jax.ShapeDtypeStruct((n, nty, block, ntx * block), imgs.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy.astype(jnp.int32), ox.astype(jnp.int32), imgs)
    out = out.reshape(n, nty, block, ntx, block).transpose(0, 1, 3, 2, 4)
    return out[0] if single else out

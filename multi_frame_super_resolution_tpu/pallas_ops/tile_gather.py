"""Pallas tile-block gather: per-tile shifted blocks with halo via DMA.

Generalizes pallas_ops.tile_warp: for each alignment tile, DMA the block
``img[tile_origin + shift - pad : ... + tile + pad]`` into its own output
slot. With pad = search_radius this is the TPU-native
convertToTilesOverlapPreShift (kernel.cu:323-378) — the search-window
extraction of the alignment stage — executed entirely by the DMA engine
with scalar-prefetched per-tile shifts (no XLA gather).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_gather_kernel(sy_ref, sx_ref, img_ref, out_ref, sem):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    block = out_ref.shape[-2]
    h = img_ref.shape[0]
    w = img_ref.shape[1]

    # sy/sx hold precomputed absolute block origins; clamp them in bounds
    y0 = sy_ref[ty, tx]
    x0 = sx_ref[ty, tx]
    y0 = jnp.clip(y0, 0, h - block)
    x0 = jnp.clip(x0, 0, w - block)

    copy = pltpu.make_async_copy(
        img_ref.at[pl.ds(y0, block), pl.ds(x0, block)],
        out_ref.at[0, 0],
        sem,
    )
    copy.start()
    copy.wait()


def tile_gather_pallas(
    img: jnp.ndarray,
    int_shifts: jnp.ndarray,
    tile_size: int,
    pad: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(H, W) image -> (nty, ntx, T+2p, T+2p) shifted blocks.

    Block (ty, tx) covers img[ty*T - p + sy : ... + T + p][...] with the
    block origin clamped in bounds (border tiles replicate interior rows
    like the reference's clamped reads, approximated at block granularity).
    """
    h, w = img.shape
    t = tile_size
    nty, ntx = -(-h // t), -(-w // t)
    block = t + 2 * pad
    if h < block or w < block:
        raise ValueError("image smaller than one padded block")

    # absolute block origins, precomputed on host-side math (traced)
    oy = jnp.arange(nty, dtype=jnp.int32)[:, None] * t - pad + int_shifts[..., 0]
    ox = jnp.arange(ntx, dtype=jnp.int32)[None, :] * t - pad + int_shifts[..., 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, block, block),
            lambda ty, tx, sy, sx: (ty, tx, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _tile_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((nty, ntx, block, block), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy.astype(jnp.int32), ox.astype(jnp.int32), img)

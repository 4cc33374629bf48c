"""Pallas tile-warp kernel: per-tile integer shifts via DMA.

The TPU-native replacement for the reference's texture-sampled warps
(WarpingKernel, opticalFlow.cu:27-44; convertToTilesOverlapPreShift,
kernel.cu:323-378): instead of per-pixel gathers, each grid step DMAs the
shifted tile block straight out of HBM — the DMA engine handles arbitrary
base offsets at full bandwidth — with the per-tile shifts delivered
through scalar prefetch so the addresses are known before the kernel body
runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_warp_kernel(sy_ref, sx_ref, img_ref, out_ref, sem):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    t_h = out_ref.shape[0]
    t_w = out_ref.shape[1]
    h = img_ref.shape[0]
    w = img_ref.shape[1]

    y0 = ty * t_h + sy_ref[ty, tx]
    x0 = tx * t_w + sx_ref[ty, tx]
    # clamp the block origin so the DMA stays in bounds (per-pixel border
    # clamping is only approximated at frame borders, like the reference's
    # whole-tile clamps)
    y0 = jnp.clip(y0, 0, h - t_h)
    x0 = jnp.clip(x0, 0, w - t_w)

    copy = pltpu.make_async_copy(
        img_ref.at[pl.ds(y0, t_h), pl.ds(x0, t_w)],
        out_ref,
        sem,
    )
    copy.start()
    copy.wait()


def tile_warp_pallas(
    img: jnp.ndarray, int_shifts: jnp.ndarray, tile_size: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas equivalent of ops.warp_fast.tile_warp_int for 2-D images
    whose height/width are multiples of tile_size.

    img: (H, W) float32; int_shifts: (nty, ntx, 2) int32.
    """
    h, w = img.shape
    t = tile_size
    nty, ntx = h // t, w // t
    assert nty * t == h and ntx * t == w, "image must be tile-aligned"

    sy = int_shifts[..., 0].astype(jnp.int32)
    sx = int_shifts[..., 1].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (t, t), lambda ty, tx, sy, sx: (ty, tx), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _tile_warp_kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), img.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sy, sx, img)

"""Pallas fused polarization-defog kernel.

The defog_cuda2 equivalent (myKernels.cu:16-52): per-pixel airlight /
transmission / radiance recovery with scalar P and Ainfi parameters, fused
into one VMEM pass over row blocks. (XLA fuses this chain well on its own;
the Pallas kernel exists as the hand-scheduled native path and is
validated against the jnp oracle.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _defog_kernel(p_ref, a_ref, lims_ref, iper_ref, ipar_ref,
                  a_out, t_out, r_out):
    p = p_ref[0, 0]
    ainfi = a_ref[0, 0]
    t_min, t_max, r_min, r_max = (
        lims_ref[0, 0], lims_ref[0, 1], lims_ref[0, 2], lims_ref[0, 3]
    )
    iper = iper_ref[:]
    ipar = ipar_ref[:]
    a = (iper - ipar) / p
    t = jnp.clip(1.0 - a / ainfi, t_min, t_max)
    r = jnp.clip((iper + ipar - a) / t, r_min, r_max)
    a_out[:] = a
    t_out[:] = t
    r_out[:] = r


def defog_pallas(
    iper: jnp.ndarray,
    ipar: jnp.ndarray,
    p: jnp.ndarray,
    ainfi: jnp.ndarray,
    t_min: float = 0.001,
    t_max: float = 0.999,
    r_min: float = 0.001,
    r_max: float = 0.999,
    block_rows: int = 128,
    interpret: bool = False,
):
    """Per-channel fused defog. iper/ipar: (H, W, 3); p, ainfi: (3,).

    Returns (A, t, R) each (H, W, 3). Grid: (channels, row blocks) so each
    kernel invocation streams one channel's row block through VMEM with
    its scalar parameters in SMEM.
    """
    h, w, c = iper.shape
    rows = min(block_rows, h)
    grid = (c, pl.cdiv(h, rows))

    # channel-planar layout so the lane dimension is W
    iper_p = jnp.moveaxis(iper, -1, 0)
    ipar_p = jnp.moveaxis(ipar, -1, 0)
    p_arr = p.reshape(c, 1).astype(jnp.float32)
    a_arr = ainfi.reshape(c, 1).astype(jnp.float32)
    lims = jnp.asarray([[t_min, t_max, r_min, r_max]], jnp.float32)
    lims = jnp.broadcast_to(lims, (c, 4))

    spec_img = pl.BlockSpec(
        (1, rows, w), lambda ch, rb: (ch, rb, 0), memory_space=pltpu.VMEM
    )
    spec_scalar = pl.BlockSpec((1, 1), lambda ch, rb: (ch, 0), memory_space=pltpu.SMEM)
    spec_lims = pl.BlockSpec((1, 4), lambda ch, rb: (ch, 0), memory_space=pltpu.SMEM)

    out_shape = jax.ShapeDtypeStruct((c, h, w), jnp.float32)
    a_p, t_p, r_p = pl.pallas_call(
        _defog_kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=grid,
        in_specs=[spec_scalar, spec_scalar, spec_lims, spec_img, spec_img],
        out_specs=(spec_img, spec_img, spec_img),
        interpret=interpret,
    )(p_arr, a_arr, lims, iper_p, ipar_p)
    return (
        jnp.moveaxis(a_p, 0, -1),
        jnp.moveaxis(t_p, 0, -1),
        jnp.moveaxis(r_p, 0, -1),
    )

"""Pallas kernel-regression merge — the hottest pipeline stage on-chip.

TPU-native kernel for the accumulate stage (accumulateImages /
accumulateImagesSuperRes, DeBayerKernels.cu:289-468), matching
models.fast_merge.merge_burst_fast bit-for-bit (same static tap pruning,
same phase-separated weight model):

  * grid = (row_blocks,): each step owns one output row block; the burst's
    frames are a STATIC in-kernel loop (F is a compile-time constant) so
    the (num, den) accumulators live in registers/VMEM for the whole block
    — the merge never writes partial sums to HBM.
  * per frame, the kernel DMAs the tap-halo window (bh + 16 rows,
    lane-aligned width) of the frame's channel planes, certainty planes
    and residual field from HBM into double-buffered VMEM scratch — the
    next frame's windows load while the current frame accumulates.
  * every tap is a STATIC slice of the scratch window (the Pallas mirror
    of the gatherless static-shift formulation) and all s^2 output phases
    are computed in-register at input resolution; the host interleaves
    phases afterwards, exactly like the XLA fast path.

Alignment notes (Mosaic): DMA slice extents on the sublane dim must be
multiples of 8 and the lane dim is kept full-width, so the halo is
over-allocated to HALO=8 rows (taps need only radius+ceil(rb)) and the
padded width is rounded up to 128 lanes.

Validated in interpret mode against merge_burst_fast
(tests/test_pallas_ops.py); the Mosaic compile is probed each round
(tools/probe_pallas.py, BENCH_NOTES.md) and the kernel is enabled with
MergeConfig.use_pallas.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multi_frame_super_resolution_tpu.models.fast_merge import (
    _active_taps,
    _output_phase_offsets,
)

_HALO = 8  # sublane-aligned row halo (>= max tap radius we ever use)


def _make_kernel(taps, phi, s: int, p: int, bh: int, w: int, rb: float,
                 num_frames: int):
    ss = s * s
    hp = _HALO

    def kernel(img_ref, cert_ref, res_ref, omega_ref, num_ref, den_ref,
               win_img, win_cert, win_res, win_omega, sems):
        i = pl.program_id(0)
        y0 = i * bh

        def frame_copies(f, slot):
            return [
                pltpu.make_async_copy(
                    img_ref.at[f, :, pl.ds(y0, bh + 2 * hp), :],
                    win_img.at[slot], sems.at[slot, 0],
                ),
                pltpu.make_async_copy(
                    cert_ref.at[f, :, pl.ds(y0, bh + 2 * hp), :],
                    win_cert.at[slot], sems.at[slot, 1],
                ),
                pltpu.make_async_copy(
                    res_ref.at[f, :, pl.ds(y0 + hp, bh), :],
                    win_res.at[slot], sems.at[slot, 2],
                ),
            ]

        omega_copy = pltpu.make_async_copy(
            omega_ref.at[:, pl.ds(y0 + hp, bh), :], win_omega, sems.at[0, 3]
        )
        omega_copy.start()
        for c in frame_copies(0, 0):
            c.start()
        omega_copy.wait()

        oxx = win_omega[0, :, p : p + w]
        oyy = win_omega[1, :, p : p + w]
        oxy = win_omega[2, :, p : p + w]

        acc_n = [None] * (ss * 3)
        acc_d = [None] * (ss * 3)
        for f in range(num_frames):
            slot = f % 2
            for c in frame_copies(f, slot):
                c.wait()
            if f + 1 < num_frames:
                for c in frame_copies(f + 1, 1 - slot):
                    c.start()

            res_y = jnp.clip(win_res[slot, 0, :, p : p + w], -rb, rb)
            res_x = jnp.clip(win_res[slot, 1, :, p : p + w], -rb, rb)
            for ky, kx in taps:
                vals = [
                    win_img[slot, c, hp + ky : hp + ky + bh, p + kx : p + kx + w]
                    for c in range(3)
                ]
                certs = [
                    win_cert[slot, c, hp + ky : hp + ky + bh, p + kx : p + kx + w]
                    for c in range(3)
                ]
                dy0 = (ky - res_y) * s
                dx0 = (kx - res_x) * s
                for py in range(s):
                    dy = dy0 - phi[py] * s
                    for px in range(s):
                        dx = dx0 - phi[px] * s
                        wgt = jnp.exp(
                            -0.5
                            * (dx * dx * oxx + dy * dy * oyy + 2.0 * dx * dy * oxy)
                        )
                        for c in range(3):
                            k = (py * s + px) * 3 + c
                            cw = wgt * certs[c]
                            nt = vals[c] * cw
                            acc_n[k] = nt if acc_n[k] is None else acc_n[k] + nt
                            acc_d[k] = cw if acc_d[k] is None else acc_d[k] + cw

        num_ref[0] = jnp.stack(acc_n, axis=0)
        den_ref[0] = jnp.stack(acc_d, axis=0)

    return kernel


def merge_fast_pallas(
    warped: jnp.ndarray,
    residual: jnp.ndarray,
    certainty: jnp.ndarray,
    omega_inv: jnp.ndarray,
    scale: int,
    radius: int = 2,
    residual_bound: float = 1.0,
    k_max: float = 1.0,
    block_rows: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas equivalent of models.fast_merge.merge_burst_fast.

    warped: (F, H, W, 3) integer-tile-warped frames; residual (F, H, W, 2);
    certainty (F, H, W, 3); omega_inv (H, W, 3). Returns (num, den) at
    (sH, sW, 3), identical to the XLA fast path.
    """
    f, h, w = warped.shape[:3]
    s = scale
    r_taps = radius + int(np.ceil(residual_bound))
    p = r_taps
    assert p <= _HALO, "tap radius exceeds the kernel's 8-row halo"
    taps = _active_taps(r_taps, residual_bound, s, k_max)
    phi = _output_phase_offsets(s)

    bh = block_rows
    while bh >= 8 and h % bh:
        bh //= 2
    if bh < 8 or h % bh or bh % 8:
        # rows not 8-divisible: fall back to the XLA formulation
        from multi_frame_super_resolution_tpu.models.fast_merge import (
            merge_burst_fast,
        )

        return merge_burst_fast(
            warped, residual, certainty, omega_inv, scale, radius,
            residual_bound, k_max,
        )
    nrb = h // bh

    # edge-pad rows by the aligned halo; pad cols by the tap radius on the
    # left and up to a 128-lane multiple on the right (extra right-padding
    # is dead data the static slices never read past taps)
    wp = -(-(w + 2 * p) // 128) * 128

    def pad_hw(x):
        pads = ((0, 0),) * (x.ndim - 2) + (
            (_HALO, _HALO),
            (p, wp - w - p),
        )
        return jnp.pad(x, pads, mode="edge")

    img_p = pad_hw(warped.transpose(0, 3, 1, 2))        # (F, 3, Hp, Wp)
    cert_p = pad_hw(certainty.transpose(0, 3, 1, 2))    # (F, 3, Hp, Wp)
    res_p = pad_hw(residual.transpose(0, 3, 1, 2))      # (F, 2, Hp, Wp)
    omega_p = pad_hw(omega_inv.transpose(2, 0, 1))      # (3, Hp, Wp)

    ss3 = s * s * 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nrb,),
        # keep the padded frame stacks in HBM explicitly — ANY lets the
        # compiler pull them whole into VMEM, which OOMs at real sizes
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        # the grid partitions the LEADING output dim (one row-block per
        # step); blocking an inner dim makes XLA hoist the whole output
        # into VMEM (observed 37 MB scoped OOM)
        out_specs=(
            pl.BlockSpec((1, ss3, bh, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ss3, bh, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, bh + 2 * _HALO, wp), jnp.float32),
            pltpu.VMEM((2, 3, bh + 2 * _HALO, wp), jnp.float32),
            pltpu.VMEM((2, 2, bh, wp), jnp.float32),
            pltpu.VMEM((3, bh, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    num, den = pl.pallas_call(
        _make_kernel(taps, phi, s, p, bh, w, float(residual_bound), f),
        out_shape=(
            jax.ShapeDtypeStruct((nrb, ss3, bh, w), jnp.float32),
            jax.ShapeDtypeStruct((nrb, ss3, bh, w), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(img_p, cert_p, res_p, omega_p)

    def interleave(acc):
        # (nrb, s*s*3, bh, W) -> (s, s, 3, H, W) -> (H, s, W, s, 3)
        # -> (sH, sW, 3)
        acc = acc.transpose(1, 0, 2, 3).reshape(s, s, 3, h, w)
        return acc.transpose(3, 0, 4, 1, 2).reshape(s * h, s * w, 3)

    return interleave(num), interleave(den)

"""Global shift-consistency optimization with outlier rejection.

TPU-native rework of the ShiftMinimizer machinery
(ShiftMinimizerKernels.cu:28-258): the reference builds per-tile pointer
arrays and runs batched cuBLAS solves with an iterate-until-clean outlier
loop. Here the per-tile problems are a single batched normal-equation
solve under ``vmap`` and the outlier loop is a fixed-trip ``lax.fori_loop``
with weight masking (checkForOutliers, ShiftMinimizerKernels.cu:80-139:
the worst measurement with squared residual > 1 px^2 is removed each
round).

Model: unknowns are the F-1 consecutive frame-to-frame shifts s_k per
tile; each measured pair (i, j) observes sum_{k=i..j-1} s_k. The optimal
shift from the reference frame to any frame is a partial sum of the s_k
(getOptimalShifts, ShiftMinimizerKernels.cu:178-218).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def measurement_pairs(num_frames: int, max_span: int = 2) -> List[Tuple[int, int]]:
    """Static pair list: all (i, j), i<j, with span <= max_span. Includes the
    consecutive chain (span 1), which keeps the system full-rank."""
    pairs = []
    for span in range(1, max_span + 1):
        for i in range(num_frames - span):
            pairs.append((i, i + span))
    return pairs


def design_matrix(num_frames: int, pairs: Sequence[Tuple[int, int]]) -> np.ndarray:
    """(P, F-1) 0/1 matrix mapping consecutive shifts to pair measurements
    (the per-tile shift matrix the reference broadcasts, copyShiftMatrix)."""
    a = np.zeros((len(pairs), num_frames - 1), np.float32)
    for p, (i, j) in enumerate(pairs):
        a[p, i:j] = 1.0
    return a


def _solve_tile(a: jnp.ndarray, m: jnp.ndarray, max_outliers: int, ridge: float):
    """One tile: a (P, K) design, m (P, 2) measurements. Returns
    (s (K, 2), weights (P,))."""
    p = a.shape[0]
    weights0 = jnp.ones((p,), jnp.float32)

    def solve(weights):
        aw = a * weights[:, None]
        hi = jax.lax.Precision.HIGHEST
        ata = jnp.matmul(aw.T, a, precision=hi) + ridge * jnp.eye(
            a.shape[1], dtype=a.dtype
        )
        atm = jnp.matmul(aw.T, m, precision=hi)
        return jnp.linalg.solve(ata, atm)

    def body(_, carry):
        weights, s = carry
        resid = a @ s - m  # (P, 2)
        d2 = jnp.sum(resid * resid, axis=-1) * weights  # ignore removed rows
        worst = jnp.argmax(d2)
        # remove the worst outlier only if its squared distance exceeds
        # 1 px^2 (checkForOutliers threshold `max = 1`)
        remove = d2[worst] > 1.0
        weights = jnp.where(
            remove, weights.at[worst].set(0.0), weights
        )
        return weights, solve(weights)

    s0 = solve(weights0)
    weights, s = jax.lax.fori_loop(0, max_outliers, body, (weights0, s0))
    return s, weights


def solve_consistent_shifts(
    measured: jnp.ndarray,
    num_frames: int,
    pairs: Sequence[Tuple[int, int]],
    max_outliers: int | None = None,
    ridge: float = 1e-6,
):
    """measured: (P, nty, ntx, 2) per-pair tile shift measurements.

    Returns (consecutive (F-1, nty, ntx, 2), weights (P, nty, ntx)) where
    weights flag which measurements survived outlier rejection.
    """
    a = jnp.asarray(design_matrix(num_frames, pairs))
    p, nty, ntx, _ = measured.shape
    if max_outliers is None:
        # keep at least K rows (the consecutive chain) in play
        max_outliers = max(p - (num_frames - 1), 0)
    m_flat = measured.transpose(1, 2, 0, 3).reshape(nty * ntx, p, 2)
    s_flat, w_flat = jax.vmap(lambda m: _solve_tile(a, m, max_outliers, ridge))(m_flat)
    s = s_flat.reshape(nty, ntx, num_frames - 1, 2).transpose(2, 0, 1, 3)
    w = w_flat.reshape(nty, ntx, p).transpose(2, 0, 1)
    return s, w


def shifts_to_reference(consecutive: jnp.ndarray, ref_index: int) -> jnp.ndarray:
    """Accumulate consecutive shifts into per-frame shifts relative to the
    reference frame (getOptimalShifts): shift[f] = sum_{k=ref..f-1} s_k for
    f > ref, minus the reverse partial sum for f < ref; shift[ref] = 0.

    consecutive: (F-1, nty, ntx, 2) -> (F, nty, ntx, 2).
    """
    k, nty, ntx, _ = consecutive.shape
    num_frames = k + 1
    csum = jnp.concatenate(
        [jnp.zeros((1, nty, ntx, 2), consecutive.dtype), jnp.cumsum(consecutive, axis=0)],
        axis=0,
    )  # csum[f] = sum of s_0..s_{f-1}
    return csum - csum[ref_index]

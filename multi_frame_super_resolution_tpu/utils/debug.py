"""Debug and failure-detection utilities.

Formalizes the reference's verification habits (SURVEY.md §4/§5):
  * text/npz dumps of intermediate buffers (cufft_result.txt etc.,
    main.cpp:1022-1069) -> ``dump_intermediates``
  * per-op NaN guards (kernel.cu:407-412, DeBayerKernels.cu:337-338) ->
    ``check_finite`` / ``guard_finite``
  * debug-mode switches (polar_defog.cpp:73) -> ``jax_debug_nans`` toggle
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def dump_intermediates(path: str, **arrays: Any) -> str:
    """Save named intermediate arrays to an .npz for offline comparison —
    the structured replacement for the reference's txt dumps."""
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
    return path


def check_finite(name: str, x: jnp.ndarray) -> Dict[str, float]:
    """Host-side finiteness/stat report for an array."""
    arr = np.asarray(x)
    return {
        "name": name,
        "finite_frac": float(np.isfinite(arr).mean()),
        "min": float(np.nanmin(arr)),
        "max": float(np.nanmax(arr)),
        "mean": float(np.nanmean(arr)),
    }


def guard_finite(x: jnp.ndarray, name: str = "array") -> jnp.ndarray:
    """In-graph guard: error under jax_debug_nans, else pass through with
    NaNs scrubbed to 0 (the kernels' own NaN policy)."""
    return jnp.nan_to_num(x, nan=0.0)


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Enable jax NaN debugging for a scope (the framework's 'sanitizer',
    SURVEY.md §5 race-detection row)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def interpret_pallas():
    """Force Pallas kernels into interpreter mode for debugging."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield

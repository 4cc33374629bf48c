"""Sharded batch execution of burst pipelines.

The production entry for scale-out (SURVEY.md §2.6 TPU-native equivalents):
vmap a per-burst pipeline over the batch axis and shard that axis on the
'data' mesh axis — XLA partitions the whole program SPMD with no
communication (burst SR is embarrassingly parallel across bursts; only
final host gathers ride ICI/DCN).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_batched_pipeline(
    fn: Callable,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
):
    """Lift a per-burst function to a jitted batched function. With a mesh,
    inputs/outputs are sharded batch-first on ``data_axis``."""
    batched = jax.vmap(fn)
    if mesh is None:
        return jax.jit(batched)
    sharding = NamedSharding(mesh, P(data_axis))
    return jax.jit(batched, in_shardings=sharding, out_shardings=sharding)


def default_mesh(data_axis: str = "data") -> Optional[Mesh]:
    """1-D data mesh over all devices; None when single-device."""
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    import numpy as np

    return Mesh(np.asarray(devices), (data_axis,))

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
    mode: Optional[str] = None,
):
    """Lift a per-burst function to a jitted batched function. With a mesh,
    inputs/outputs are sharded batch-first on ``data_axis``.

    mode "scan" iterates bursts sequentially on-device (a single chip runs
    them serially anyway, and — unlike vmap — it composes with Pallas
    kernels whose batch axes are grid dimensions); mode "vmap" batches the
    whole program. Default: scan on a single device, vmap over a mesh
    (a scan over a sharded axis would serialize across shards).
    """
    if mode is None:
        mode = "scan" if mesh is None else "vmap"
    if mode == "scan":
        def batched(batch):
            _, outs = jax.lax.scan(lambda _, b: (None, fn(b)), None, batch)
            return outs
    elif mode == "vmap":
        batched = jax.vmap(fn)
    else:
        raise ValueError(f"unknown mode {mode!r}")
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

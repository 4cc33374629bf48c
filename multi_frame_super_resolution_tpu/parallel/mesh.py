"""Device mesh construction and burst-batch sharding.

The single communication backend of this framework (SURVEY.md §2.6):
jax.sharding + pjit/shard_map collectives over ICI. The reference is
single-GPU (cudaSetDevice(0) hardcoded, myKernels.cu:31-33); its TPU-native
scaling story is:

  * data parallelism — shard the batch of bursts on a 'data' axis
  * spatial parallelism — shard frame rows on a 'spatial' axis with halo
    exchange (the reference's tile decomposition made multi-chip), see
    parallel/spatial.py
  * tensor parallelism — shard DNN-SR conv channels on a 'model' axis
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices. With no sizes given, all
    devices go on the first axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = [len(devices)] + [1] * (len(axis_names) - 1)
    n = int(np.prod(axis_sizes))
    if n != len(devices):
        raise ValueError(
            f"mesh of {axis_sizes} needs {n} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, tuple(axis_names))


def data_model_mesh(n_devices: Optional[int] = None) -> Mesh:
    """2-D (data, model) mesh: model axis 2 when the device count allows."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    model = 2 if n % 2 == 0 and n >= 2 else 1
    return make_mesh(("data", "model"), (n // model, model), devices)


def burst_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch of bursts (B, F, H, W, C): batch on 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the batch axis sharded on 'data'."""
    return jax.device_put(batch, burst_batch_sharding(mesh))

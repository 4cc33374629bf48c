"""Spatial (row-block) sharding with halo exchange.

The multi-chip generalization of the reference's tile decomposition
(kernel.cu:264-378): a frame too large for one chip is sharded by rows
across the 'spatial' mesh axis; window ops exchange `halo` boundary rows
with mesh neighbors via ``lax.ppermute`` over ICI inside ``shard_map``,
compute locally, and crop — no host involvement.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _exchange_halos(x: jnp.ndarray, halo: int, axis: str):
    """Return (from_prev, from_next) halo row blocks for a local row block
    x (h_local, ...). Endpoint shards replicate their own edge rows
    (matching the replicate-border convention of the single-chip ops)."""
    n = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    top = x[:halo]
    bot = x[-halo:]
    # neighbor transfers ride ICI; endpoints receive zeros
    from_prev = lax.ppermute(bot, axis, [(i, i + 1) for i in range(n - 1)])
    from_next = lax.ppermute(top, axis, [(i + 1, i) for i in range(n - 1)])
    # replicate edges at the global image border
    edge_top = jnp.repeat(x[:1], halo, axis=0)
    edge_bot = jnp.repeat(x[-1:], halo, axis=0)
    from_prev = jnp.where((idx == 0), edge_top, from_prev)
    from_next = jnp.where((idx == n - 1), edge_bot, from_next)
    return from_prev, from_next


def spatial_map(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    halo: int,
    mesh: Mesh,
    axis: str = "spatial",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Lift a window op ``fn`` (same-size H x W [-> xC] image transform
    whose output row i depends on input rows within +-halo) to an image
    row-sharded over ``axis``.

    fn is applied to the halo-extended local block; the halo rows are
    cropped from its output.
    """

    def local(x):
        from_prev, from_next = _exchange_halos(x, halo, axis)
        extended = jnp.concatenate([from_prev, x, from_next], axis=0)
        out = fn(extended)
        return out[halo:-halo]

    spec_img = P(axis)
    return shard_map(
        local, mesh=mesh, in_specs=(spec_img,), out_specs=spec_img, check_rep=False
    )


def sharded_rows(mesh: Mesh, axis: str = "spatial") -> NamedSharding:
    """Sharding placing an image's leading (row) axis on the spatial mesh
    axis."""
    return NamedSharding(mesh, P(axis))

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
try:  # jax >= 0.4.35 promotes shard_map out of experimental (and renames
    # check_rep -> check_vma)
    from jax import shard_map as _shard_map_new

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map_new(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover
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


def _exchange_halos_axis(x: jnp.ndarray, halo: int, mesh_axis: str, dim: int):
    """(from_prev, from_next) halo blocks along array dimension `dim` of
    the local block, exchanged with mesh neighbors (replicated edges at
    the global border)."""
    n = lax.axis_size(mesh_axis)
    idx = lax.axis_index(mesh_axis)

    def take(a, sl):
        index = [slice(None)] * a.ndim
        index[dim] = sl
        return a[tuple(index)]

    top = take(x, slice(0, halo))
    bot = take(x, slice(x.shape[dim] - halo, x.shape[dim]))
    from_prev = lax.ppermute(bot, mesh_axis, [(i, i + 1) for i in range(n - 1)])
    from_next = lax.ppermute(top, mesh_axis, [(i + 1, i) for i in range(n - 1)])
    edge_top = jnp.repeat(take(x, slice(0, 1)), halo, axis=dim)
    edge_bot = jnp.repeat(
        take(x, slice(x.shape[dim] - 1, x.shape[dim])), halo, axis=dim
    )
    from_prev = jnp.where(idx == 0, edge_top, from_prev)
    from_next = jnp.where(idx == n - 1, edge_bot, from_next)
    return from_prev, from_next


def pipeline_halo(cfg, warp_bound: int = 16, prealign_px: int = 0) -> int:
    """Row halo (in input pixels) for running the handheld SR pipeline on
    a row shard: covers the tile-warp clamp bound, the LK window + its
    bounded warp, the merge tap window, and the robustness 5x5 spread —
    rounded up to a whole number of alignment tiles so the shard's tile
    grid coincides with the global grid.

    ``prealign_px``: extra rows for the GLOBAL pre-alignment warp's reach
    when cfg.prealign is on under sharding — the rotation/scale about the
    global center displaces a shard-edge pixel by up to
    |theta| * max(H, W)/2 + |scale-1| * max(H, W)/2 + |translation| px;
    budget that here (content beyond the halo is edge-replicated and the
    affected rows are only correct to within the clamp)."""
    import numpy as np

    t = cfg.align.tile_size
    # post-merge restoration FIR (ops/restore.py): radius 3 at OUTPUT
    # resolution -> ceil(3/scale) input rows of reach
    restore_reach = (
        int(np.ceil(3.0 / cfg.scale))
        if (cfg.final_restore and cfg.scale == 2)
        else 0
    )
    reach = (
        warp_bound
        + 2 * cfg.lk.half_window + 2
        + cfg.merge.radius + int(np.ceil(cfg.residual_bound))
        + 5
        + restore_reach
        + int(prealign_px)
    )
    return t * int(np.ceil(reach / t))


def handheld_superres_sharded(
    burst: jnp.ndarray,
    cfg,
    mesh: Mesh,
    axis: str = "spatial",
    halo: int | None = None,
) -> jnp.ndarray:
    """Row-sharded handheld burst SR: the multi-chip path for frames
    larger than one chip (the reference's tile decomposition,
    kernel.cu:264-378, lifted to the device mesh).

    burst: (F, H, W, 3) with H row-sharded over `axis`. Each shard runs
    the full single-chip pipeline (models.handheld.handheld_superres) on
    its halo-extended row block — the halo is a whole number of alignment
    tiles, so every interior tile sees exactly the data it would see in a
    global run — and crops the scaled halo from the output. Requires
    H/n_shards and the halo to be multiples of the alignment tile size.
    """
    from multi_frame_super_resolution_tpu.models.handheld import handheld_superres

    n = mesh.shape[axis]
    f, h, w = burst.shape[:3]
    t = cfg.align.tile_size
    if halo is None:
        halo = pipeline_halo(cfg)
    if (h // n) % t or halo % t:
        raise ValueError(
            f"shard height {h // n} and halo {halo} must be multiples of "
            f"tile_size {t}"
        )
    s = cfg.scale
    h_local = h // n

    if cfg.prealign:
        # estimate the GLOBAL similarity ONCE from the (sharded) full
        # luma — XLA inserts the gathers for the small downsampled FFTs —
        # and pass the per-frame transforms into every shard, which
        # applies them about the GLOBAL image center. Round 2 let each
        # shard estimate its own similarity from its row strip; estimates
        # could disagree across shards and each rotated about its local
        # block center, seaming rotated bursts.
        from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
        from multi_frame_super_resolution_tpu.registration.prealign import (
            estimate_burst_similarity,
        )

        st = estimate_burst_similarity(rgb_to_gray(burst), cfg.prealign_cfg)

        def local(x, st_rep):  # (F, h_local, W, 3)
            prev, nxt = _exchange_halos_axis(x, halo, axis, dim=1)
            ext = jnp.concatenate([prev, x, nxt], axis=1)
            y0 = (
                lax.axis_index(axis).astype(jnp.float32) * h_local - halo
            )
            out = handheld_superres(
                ext, cfg,
                prealign_override=(st_rep, (y0, 0.0), (h, w)),
            )
            return out[halo * s : out.shape[0] - halo * s]

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P()),
            out_specs=P(axis),
            check_rep=False,
        )
        return fn(burst, st)

    def local(x):  # (F, h_local, W, 3)
        prev, nxt = _exchange_halos_axis(x, halo, axis, dim=1)
        ext = jnp.concatenate([prev, x, nxt], axis=1)
        out = handheld_superres(ext, cfg)
        return out[halo * s : out.shape[0] - halo * s]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(axis),
        check_rep=False,
    )
    return fn(burst)


def handheld_superres_raw_sharded(
    raw_burst: jnp.ndarray,
    cfg,
    mesh: Mesh,
    axis: str = "spatial",
    halo: int | None = None,
) -> jnp.ndarray:
    """Row-sharded RAW handheld SR (see handheld_superres_sharded). The
    halo and shard height must be multiples of 2*tile_size in RAW rows
    (the alignment tiles live on the half-resolution grid and the CFA
    phase must be preserved across shard boundaries)."""
    from multi_frame_super_resolution_tpu.models.handheld import (
        handheld_superres_raw,
    )

    n = mesh.shape[axis]
    f, h, w = raw_burst.shape
    t2 = 2 * cfg.align.tile_size
    if halo is None:
        halo = 2 * pipeline_halo(cfg)
    if (h // n) % t2 or halo % t2:
        raise ValueError(
            f"RAW shard height {h // n} and halo {halo} must be multiples "
            f"of 2*tile_size = {t2}"
        )
    s = cfg.scale
    h_local = h // n

    if cfg.prealign:
        # global similarity estimated ONCE on the full half-res luma (see
        # handheld_superres_sharded); override units are HALF-RES
        from multi_frame_super_resolution_tpu.models.fast_merge import (
            raw_to_planes,
        )
        from multi_frame_super_resolution_tpu.models.handheld import (
            _subsample_from_planes,
        )
        from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
        from multi_frame_super_resolution_tpu.registration.prealign import (
            estimate_burst_similarity,
        )

        gray_half = rgb_to_gray(
            _subsample_from_planes(raw_to_planes(raw_burst), cfg.cfa_pattern)
        )
        st = estimate_burst_similarity(gray_half, cfg.prealign_cfg)

        def local(x, st_rep):  # (F, h_local, W)
            prev, nxt = _exchange_halos_axis(x, halo, axis, dim=1)
            ext = jnp.concatenate([prev, x, nxt], axis=1)
            y0_half = (
                lax.axis_index(axis).astype(jnp.float32) * h_local - halo
            ) / 2.0
            out = handheld_superres_raw(
                ext, cfg,
                prealign_override=(st_rep, (y0_half, 0.0), (h // 2, w // 2)),
            )
            return out[halo * s : out.shape[0] - halo * s]

        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(None, axis), P()),
            out_specs=P(axis),
            check_rep=False,
        )
        return fn(raw_burst, st)

    def local(x):  # (F, h_local, W)
        prev, nxt = _exchange_halos_axis(x, halo, axis, dim=1)
        ext = jnp.concatenate([prev, x, nxt], axis=1)
        out = handheld_superres_raw(ext, cfg)
        return out[halo * s : out.shape[0] - halo * s]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis),),
        out_specs=P(axis),
        check_rep=False,
    )
    return fn(raw_burst)

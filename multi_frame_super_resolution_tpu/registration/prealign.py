"""Global similarity pre-alignment for burst pipelines.

The reference's alignment model carries a GLOBAL per-frame base
shift + rotation into tile extraction (convertToTilesOverlapBorder
applies `baseShift`/`baseRotation` about the image center,
kernel.cu:264-318) — without it, per-tile translation search cannot
follow rotated frames (the bundled city burst is generated with
rotations of 0/0/5/10/-15 degrees, main.cpp:1896). The FFT
registration the reference left unfinished (PreAlignment,
boxFilterNPP.cpp:102-166) is exactly the estimator for that global
stage; this module wires our completed log-polar similarity
registration (registration/logpolar.py) in front of the tile pyramid:

  estimate rotation/scale/translation per alternate  ->  one backward
  warp into reference geometry (+ validity mask)  ->  tile alignment
  sees translation-only residuals.

Frames whose estimated rotation AND scale are negligible are passed
through untouched (jnp.where select, jit-safe) so well-aligned frames
keep their original samples unresampled.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import PREALIGN_FAST, RegistrationConfig
from multi_frame_super_resolution_tpu.ops.geometry import remap
from multi_frame_super_resolution_tpu.registration.logpolar import (
    SimilarityTransform,
    register_similarity,
)


def _box_down(gray: jnp.ndarray, ds: int) -> jnp.ndarray:
    """Box-mean downsample (..., H, W) by an integer factor. Rows pool
    via a free major-axis reshape + sublane mean; columns via the MXU
    pooling matmul (a lane-axis reshape+reduce relayouts, ~54 us per
    plane on v5e — see ops.geometry.pool_cols_mxu)."""
    if ds <= 1:
        return gray
    from multi_frame_super_resolution_tpu.ops.geometry import pool_cols_mxu

    h, w = gray.shape[-2], gray.shape[-1]
    hh = h // ds
    x = gray[..., : hh * ds, :]
    rows = x.reshape(x.shape[:-2] + (hh, ds, w)).mean(axis=-2)
    return pool_cols_mxu(rows, ds)


def estimate_burst_similarity(
    gray: jnp.ndarray,
    cfg: RegistrationConfig = PREALIGN_FAST,
    with_translation: bool = True,
) -> SimilarityTransform:
    """Per-alternate similarity vs frame 0. gray: (F, H, W) luma.
    Returns stacked SimilarityTransform with leading axis F-1.

    with_translation=False estimates only rotation/scale (translation =
    0), saving one bicubic unrotate remap and one phase correlation per
    frame — but the global subpixel translation measurably beats leaving
    recovery to the tile pyramid (+4.4 dB RGB / +0.4 dB RAW on city), so
    it stays on by default.

    cfg.downsample > 1 estimates on box-downsampled luma (all FFTs,
    log-polar maps, and warps shrink by ds per axis — this is where the
    stage's TPU time goes) and rescales the translation back; rotation
    and scale are resolution-invariant. The residual estimation error
    (<~0.5 px at ds=2) is inside the tile pyramid's capture range.

    Downsampling stops when the log-polar map would fall under 128
    cells: below that the rotation/scale quantization visibly hurts
    (measured on the 130x228 car burst: ds=2 estimates cost ~1.9 dB on
    the RGB pipeline vs full-res estimates)."""
    ds_req = max(int(cfg.downsample), 1)
    ds = ds_req
    h, w = gray.shape[-2], gray.shape[-1]
    while ds > 1 and max(h // ds, w // ds) < 128:
        ds //= 2
    if ds < ds_req and ds == 1 and cfg.lp_radius_step > 1:
        # the image was too SMALL for the requested downsampling; such
        # images need full radial resolution too (the car burst's ~0.2%
        # scales are below a doubled log-radius cell's subpixel floor).
        # An explicitly configured downsample=1 keeps its radius step.
        import dataclasses

        cfg = dataclasses.replace(cfg, lp_radius_step=1)
    if ds > 1:
        gray = _box_down(gray, ds)
    ref = gray[0]
    if with_translation:
        st = jax.vmap(lambda g: register_similarity(ref, g, cfg))(gray[1:])
        if ds > 1:
            st = SimilarityTransform(
                rotation=st.rotation,
                scale=st.scale,
                translation=st.translation * float(ds),
                response=st.response,
            )
        return st

    from multi_frame_super_resolution_tpu.registration.logpolar import (
        register_rotation_scale,
    )

    def one(g):
        rotation, scale, peak = register_rotation_scale(ref, g, cfg)
        return SimilarityTransform(
            rotation=rotation,
            scale=scale,
            translation=jnp.zeros(2, jnp.float32),
            response=peak,
        )

    return jax.vmap(one)(gray[1:])


def _source_grid(
    h: int,
    w: int,
    st: SimilarityTransform,
    offset: Tuple[float, float] = (0.0, 0.0),
    origin=None,
    global_hw: Tuple[int, int] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward-warp source coordinates G(y - d) reconstructing the
    reference frame from the moved frame: ref(y) ~= moved(G(y - d)),
    where G is the unrotate/unscale map register_similarity used before
    measuring the translation d (composition verified empirically on the
    city burst, tools/eval: "order A sign -1").

    ``offset`` shifts the OUTPUT grid by a constant (sub)pixel amount —
    used for CFA planes whose sites sit at (+a/2, +b/2) in half-res
    units.

    ``origin``/``global_hw`` support SHARDED evaluation: the (h, w) block
    is a window of a ``global_hw`` image whose [0, 0] sits at global
    coordinates ``origin`` (may be traced, e.g. derived from
    lax.axis_index inside shard_map). The similarity is evaluated about
    the GLOBAL image center — the fix for round-2's sharding hole where
    each shard rotated about its local block center — and the returned
    source coordinates are LOCAL to the block."""
    gh, gw = global_hw if global_hw is not None else (h, w)
    oy, ox = (0.0, 0.0) if origin is None else origin
    cy, cx = (gh - 1) / 2.0, (gw - 1) / 2.0
    ys = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.float32)[:, None] + offset[0], (h, w)
    ) + oy
    xs = jnp.broadcast_to(
        jnp.arange(w, dtype=jnp.float32)[None, :] + offset[1], (h, w)
    ) + ox
    yy = ys - st.translation[0] - cy
    xx = xs - st.translation[1] - cx
    ca = jnp.cos(st.rotation)
    sa = jnp.sin(st.rotation)
    src_y = (sa * xx + ca * yy) * st.scale + cy - offset[0] - oy
    src_x = (ca * xx - sa * yy) * st.scale + cx - offset[1] - ox
    # undo the output offset on the source side too: plane (a, b) of the
    # MOVED frame is also sampled at sites (+a/2, +b/2), so its array
    # indices are positions minus the offset
    return src_y, src_x


def similarity_is_significant(
    st: SimilarityTransform,
    rot_eps: float = 2e-3,
    scale_eps: float = 2e-3,
) -> jnp.ndarray:
    """Boolean per frame: the similarity deviates enough from identity
    that resampling beats keeping original samples (0.002 rad moves an
    image corner of the city frame by ~0.5 px). The warp applies the
    SUBPIXEL global translation too, which the per-tile integer +
    bounded-residual pipeline cannot fully use — on the car burst
    warping its barely-significant frames is worth ~+2 dB RGB, so the
    gate errs toward warping."""
    return (jnp.abs(st.rotation) > rot_eps) | (
        jnp.abs(st.scale - 1.0) > scale_eps
    )


def prewarp_frame(
    frame: jnp.ndarray,
    st: SimilarityTransform,
    method: str = "bilinear",
    offset: Tuple[float, float] = (0.0, 0.0),
    fast: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp one (H, W) or (H, W, C) frame into reference geometry.
    Returns (warped, valid) where valid is the in-bounds mask of the
    source coordinates.

    fast=True resamples through the gatherless tile-decomposed one-hot
    warp (ops.warp_fast.similarity_warp_fast, always bilinear) instead
    of a per-pixel gather remap — the similarity flow field is smooth,
    so the decomposition is exact for rotations up to ~30 deg."""
    h, w = frame.shape[0], frame.shape[1]
    src_y, src_x = _source_grid(h, w, st, offset)
    if fast:
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            similarity_warp_fast,
        )

        warped = similarity_warp_fast(frame, src_y, src_x)
    else:
        warped = remap(frame, src_y, src_x, method)
    valid = _source_valid(src_y, src_x, h, w, fast).astype(frame.dtype)
    return warped, valid


def _source_valid(
    src_y: jnp.ndarray, src_x: jnp.ndarray, h: int, w: int, fast: bool
) -> jnp.ndarray:
    """In-bounds mask of backward-warp source coordinates; for the fast
    (one-hot) warp also masks pixels whose relative shift exceeds the
    warp's clamp bound — the clamp silently misplaces content, so
    saturated pixels must not be marked valid (advisor finding r2)."""
    valid = (
        (src_y >= 0.0)
        & (src_y <= h - 1.0)
        & (src_x >= 0.0)
        & (src_x <= w - 1.0)
    )
    if fast:
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            default_warp_bound,
        )

        b = float(default_warp_bound(h, w))
        ys = jnp.arange(h, dtype=jnp.float32)[:, None]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :]
        valid = (
            valid
            & (jnp.abs(src_y - ys) <= b)
            & (jnp.abs(src_x - xs) <= b)
        )
    return valid


def apply_burst_similarity(
    burst: jnp.ndarray,
    st: SimilarityTransform,
    cfg: RegistrationConfig = PREALIGN_FAST,
    method: str = "bilinear",
    origin=None,
    global_hw: Tuple[int, int] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp the alternates of ``burst`` (F, H, W[, C]) by per-alternate
    similarities ``st`` (leading axis F-1). origin/global_hw: see
    _source_grid — used by the row-sharded pipelines, which estimate st
    ONCE globally and apply it per shard about the global center."""
    h, w = burst.shape[1], burst.shape[2]
    fm1 = burst.shape[0] - 1
    use = similarity_is_significant(st)

    def grid_of(st_k):
        return jnp.stack(
            _source_grid(h, w, st_k, origin=origin, global_hw=global_hw), 0
        )

    grids = jax.vmap(grid_of)(st)  # (F-1, 2, H, W)

    if cfg.fast_warp and burst.ndim == 4:
        # warp CHANNEL-LEADING 2-D planes in one stacked vmap: a
        # channel-minor (H, W, C) operand puts C on the TPU lane dim
        # (padded to 128 lanes, ~C/128 utilization — measured 5.4 ms for
        # this stage on the 5x256x512x3 city burst vs ~0.4 ms stacked)
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            similarity_warp_fast,
        )

        # channels ride as a leading batch INSIDE the warp (batch_dims=1)
        # so the per-frame one-hot masks are built once and shared by the
        # C planes instead of being recomputed per plane.
        planes = burst[1:].transpose(0, 3, 1, 2)  # (F-1, C, H, W)
        warped = jax.vmap(
            lambda im, gg: similarity_warp_fast(im, gg[0], gg[1], batch_dims=1)
        )(planes, grids).transpose(0, 2, 3, 1)
    else:

        def one(frame, gg):
            if cfg.fast_warp:
                from multi_frame_super_resolution_tpu.ops.warp_fast import (
                    similarity_warp_fast,
                )

                return similarity_warp_fast(frame, gg[0], gg[1])
            return remap(frame, gg[0], gg[1], method)

        warped = jax.vmap(one)(burst[1:], grids)

    def valid_of(gg, use_k):
        valid = _source_valid(gg[0], gg[1], h, w, cfg.fast_warp).astype(
            burst.dtype
        )
        keep = use_k.astype(burst.dtype)
        return valid * keep + (1.0 - keep)

    valid = jax.vmap(valid_of)(grids, use)
    usex = use[:, None, None, None] if burst.ndim == 4 else use[:, None, None]
    warped = jnp.where(usex, warped, burst[1:])
    ones = jnp.ones(burst.shape[:3], burst.dtype)[:1]
    return (
        jnp.concatenate([burst[:1], warped], axis=0),
        jnp.concatenate([ones, valid], axis=0),
    )


def prealign_burst(
    burst: jnp.ndarray,
    gray: jnp.ndarray,
    cfg: RegistrationConfig = PREALIGN_FAST,
    method: str = "bilinear",
    with_translation: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-align an RGB/grayscale burst (F, H, W[, C]) against frame 0.

    gray: (F, H, W) luma used for estimation. Returns
    (burst', valid (F, H, W)) — frame 0 and near-identity frames pass
    through with valid=1."""
    st = estimate_burst_similarity(gray, cfg, with_translation)
    return apply_burst_similarity(burst, st, cfg, method)


def apply_planes_similarity(
    planes: jnp.ndarray,
    st: SimilarityTransform,
    cfg: RegistrationConfig = PREALIGN_FAST,
    method: str = "bilinear",
    origin=None,
    global_hw: Tuple[int, int] | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp the alternates of a CFA-plane burst (F, 2, 2, hh, hw) by
    per-alternate similarities ``st`` (leading axis F-1); each plane is
    warped with its own (+a/2, +b/2) half-res site offset so chroma
    stays registered. Returns (planes', valid (F, hh, hw)).
    origin/global_hw are HALF-RES units (see _source_grid) for the
    row-sharded RAW pipeline."""
    use = similarity_is_significant(st, rot_eps=6e-3, scale_eps=6e-3)
    fm1 = planes.shape[0] - 1
    hh, hw = planes.shape[-2], planes.shape[-1]

    if cfg.fast_warp:
        from multi_frame_super_resolution_tpu.ops.warp_fast import (
            similarity_warp_fast,
        )

        # ONE vmapped trace over all (alternate, plane) pairs: the source
        # grids differ per plane only through the (+a/2, +b/2) site
        # offsets, so they are built outside the warp and stacked
        def grids(st_k):
            g = [
                jnp.stack(
                    _source_grid(
                        hh, hw, st_k, (a / 2.0, b / 2.0), origin, global_hw
                    ),
                    0,
                )
                for a in (0, 1)
                for b in (0, 1)
            ]
            return jnp.stack(g, 0)  # (4, 2, hh, hw)

        g = jax.vmap(grids)(st).reshape(fm1 * 4, 2, hh, hw)
        flat = planes[1:].reshape(fm1 * 4, hh, hw)
        warped = jax.vmap(
            lambda im, gg: similarity_warp_fast(im, gg[0], gg[1])
        )(flat, g).reshape(fm1, 2, 2, hh, hw)
    else:

        def one_slow(pl, st_k):
            outs = []
            for a in (0, 1):
                row = []
                for b in (0, 1):
                    src_y, src_x = _source_grid(
                        hh, hw, st_k, (a / 2.0, b / 2.0), origin, global_hw
                    )
                    row.append(remap(pl[a, b], src_y, src_x, method))
                outs.append(jnp.stack(row, 0))
            return jnp.stack(outs, 0)

        warped = jax.vmap(one_slow)(planes[1:], st)

    warped = jnp.where(use[:, None, None, None, None], warped, planes[1:])

    # validity is pure coordinate math (no resample needed)
    def valid_one(st_k, use_k):
        src_y, src_x = _source_grid(
            hh, hw, st_k, origin=origin, global_hw=global_hw
        )
        valid = _source_valid(src_y, src_x, hh, hw, cfg.fast_warp).astype(
            planes.dtype
        )
        keep = use_k.astype(planes.dtype)
        return valid * keep + (1.0 - keep)

    valid = jax.vmap(valid_one)(st, use)
    ones = jnp.ones(
        (1, hh, hw), planes.dtype
    )
    return (
        jnp.concatenate([planes[:1], warped], axis=0),
        jnp.concatenate([ones, valid], axis=0),
    )


def prealign_planes(
    planes: jnp.ndarray,
    gray_half: jnp.ndarray,
    cfg: RegistrationConfig = PREALIGN_FAST,
    method: str = "bilinear",
    with_translation: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pre-align a CFA-plane burst (F, 2, 2, hh, hw) using half-res luma
    (F, hh, hw) for estimation. Each plane is warped with its own
    (+a/2, +b/2) half-res site offset so chroma stays registered.
    Returns (planes', valid (F, hh, hw)).

    The significance gate is 3x stricter than the RGB path's: warping
    the half-res CFA planes resamples each sparse color channel, which
    costs real chroma resolution — only clearly-rotated/scaled frames
    (>~2 px corner displacement) are worth it. Measured on the car
    burst: warping its ~0.2%-scale frames costs 1.2 dB RAW while the
    same warps GAIN 2.6 dB on the RGB path."""
    st = estimate_burst_similarity(gray_half, cfg, with_translation)
    return apply_planes_similarity(planes, st, cfg, method)

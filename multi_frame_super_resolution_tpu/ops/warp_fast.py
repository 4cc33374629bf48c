"""Gatherless warp primitives — the TPU fast path.

XLA gathers with per-pixel 2-D indices are the dominant cost of the naive
pipeline on TPU (SURVEY.md §7 hard-part #1). These primitives reformulate
every warp the burst pipelines need into operations the VPU executes at
full rate:

  * integer-factor upsampling -> phase-separated static-shift
    interpolation (exact bilinear/bicubic, no gather)
  * bounded-residual warp -> weighted sum over a static shift window with
    per-pixel weights (exact bilinear for |flow| <= r)
  * per-tile integer shift warp -> one structured gather (XLA) or the
    Pallas DMA kernel (pallas_ops/warp.py)

The decomposition flow = per-tile integer shift + bounded residual is
exact for tile-aligned flows and clamps only the tail of the LK
refinement (which is small by construction).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped static shift: out[y, x] = img[y+dy, x+dx]."""
    h, w = img.shape[0], img.shape[1]
    pad = max(abs(dy), abs(dx), 1)
    pads = ((pad, pad), (pad, pad)) + ((0, 0),) * (img.ndim - 2)
    xp = jnp.pad(img, pads, mode="edge")
    return xp[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def upsample_nearest(img: jnp.ndarray, s: int) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(img, s, axis=0), s, axis=1)


def _phase_taps_1d(s: int, method: str) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-phase taps for integer-factor upsampling with the
    pixel-center convention src = (o + 0.5)/s - 0.5.

    Returns (bases (s,), weights (s, K)) with K = 2 (bilinear) or 4
    (bicubic): out[o] = sum_k w[o%s, k] * img[base[o%s] + o//s + k - off].
    """
    phases = (np.arange(s) + 0.5) / s - 0.5
    base = np.floor(phases).astype(np.int64)
    frac = phases - base
    if method == "bilinear":
        weights = np.stack([1.0 - frac, frac], axis=1)
        offsets = np.arange(2)
    elif method == "bicubic":
        a = -0.75

        def k(x):
            ax = np.abs(x)
            w1 = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
            w2 = ((a * ax - 5.0 * a) * ax + 8.0 * a) * ax - 4.0 * a
            return np.where(ax <= 1.0, w1, np.where(ax < 2.0, w2, 0.0))

        weights = np.stack([k(frac + 1.0), k(frac), k(1.0 - frac), k(2.0 - frac)], axis=1)
        offsets = np.arange(4) - 1
    else:
        raise ValueError(method)
    return base[:, None] + offsets[None, :], weights.astype(np.float32)


def upsample_int(img: jnp.ndarray, s: int, method: str = "bilinear") -> jnp.ndarray:
    """Integer-factor upsample, numerically identical to
    resize(img, s*H, s*W, method) but built from static shifts and
    constant weights (no gather). img: (H, W[, C])."""
    if s == 1:
        return img
    taps, weights = _phase_taps_1d(s, method)  # (s, K)
    h, w = img.shape[0], img.shape[1]
    kk = taps.shape[1]

    # rows: out has s phases interleaved along a new axis then reshaped
    def axis_upsample(x, axis):
        phases = []
        for p in range(s):
            acc = None
            for k in range(kk):
                d = int(taps[p, k])
                shifted = _shift2d(x, d if axis == 0 else 0, d if axis == 1 else 0)
                term = shifted * weights[p, k]
                acc = term if acc is None else acc + term
            phases.append(acc)
        stacked = jnp.stack(phases, axis=axis + 1)  # (H, s, ...) or (., W, s, .)
        new_shape = list(x.shape)
        new_shape[axis] = x.shape[axis] * s
        return stacked.reshape(new_shape)

    out = axis_upsample(img, 0)
    return axis_upsample(out, 1)


def upsample_int_phases(
    img: jnp.ndarray, s: int, method: str = "bilinear"
) -> jnp.ndarray:
    """Phase-domain integer-factor upsample: returns (s, s, H, W[, C])
    where out[py, px, i, j] = upsample_int(img, s)[s*i + py, s*j + px].
    Lets callers do all post-merge pointwise math at input resolution
    and interleave phases ONCE at the very end (the interleave is a
    lane-crossing transpose — the single most expensive op in the merge
    pipeline when done per-array)."""
    if s == 1:
        return img[None, None]
    taps, weights = _phase_taps_1d(s, method)
    kk = taps.shape[1]

    def axis_phases(x, axis):
        outs = []
        for p in range(s):
            acc = None
            for k in range(kk):
                d = int(taps[p, k])
                shifted = _shift2d(x, d if axis == 0 else 0, d if axis == 1 else 0)
                term = shifted * weights[p, k]
                acc = term if acc is None else acc + term
            outs.append(acc)
        return outs

    rows = axis_phases(img, 0)  # list of s arrays (H, W[, C])
    return jnp.stack(
        [jnp.stack(axis_phases(r, 1), axis=0) for r in rows], axis=0
    )  # (s, s, H, W[, C])


def interleave_phases(p: jnp.ndarray) -> jnp.ndarray:
    """(s, s, H, W[, C]) phase planes -> (s*H, s*W[, C])."""
    s = p.shape[0]
    h, w = p.shape[2], p.shape[3]
    trailing = p.shape[4:]
    perm = (2, 0, 3, 1) + tuple(range(4, p.ndim))
    return p.transpose(perm).reshape((s * h, s * w) + trailing)


def upsample_int_phases_planes(
    img: jnp.ndarray, s: int, method: str = "bilinear"
) -> jnp.ndarray:
    """Channel-LEADING phase-domain upsample: (H, W, C) ->
    (s, s, C, H, W). The per-phase tap math runs on 2-D planes (a
    channel-minor (H, W, C) operand puts C on the 128-padded TPU lane
    dim — see ops.filters notes)."""
    x = jnp.moveaxis(img, -1, 0)  # (C, H, W)
    out = jax.vmap(lambda p: upsample_int_phases(p, s, method))(x)
    return jnp.moveaxis(out, 0, 2)  # (s, s, C, H, W)


def interleave_phases_planes(p: jnp.ndarray) -> jnp.ndarray:
    """Channel-leading phase planes (s, s, C, H, W) -> (s*H, s*W, C)."""
    s = p.shape[0]
    c, h, w = p.shape[2], p.shape[3], p.shape[4]
    return p.transpose(3, 0, 4, 1, 2).reshape(s * h, s * w, c)


def interleave_phases_planes_mxu(
    p: jnp.ndarray, precision="highest"
) -> jnp.ndarray:
    """Channel-leading phase planes (s, s, C, H, W) -> (s*H, s*W, C),
    column interleave as MXU scatter matmuls.

    The transpose+reshape form is cheap on well-laid-out inputs, but in
    the full pipeline XLA's layout assignment feeds it channel-minor
    data (C=3 on the 128-lane dim) and the lowered relayout copy was
    the single most expensive op of the RAW pipeline (~587 us/burst at
    city size, ~1/3 of the total — round-3 device trace).

    Structure chosen so NO operand needs a physical relayout:
      * one matmul PER px phase contracting only w (already the minor
        dim of the phase planes) with a 0/1 scatter matrix (w, s*w)
        that drops column j at s*j + px — contracting (px, w) jointly
        would force the same px-minor relayout being avoided;
      * the row interleave is transpose (py, C, H, k) -> (C, H, py, k),
        which permutes only NON-minor dims (tile reordering, no
        lane/sublane shuffles) and then reshapes adjacent major dims
        (H, py) -> s*H for free;
      * the final moveaxis to channel-last matches the (H, W, C)
        entry layout {1,0,2} (physically channel-leading) — a bitcast.

    Each output column receives exactly one input column, so the
    matmul is numerically exact except for operand rounding at reduced
    matmul precision: the default "highest" is bit-exact f32; None
    (backend default, bf16 operands) is ~1e-3 relative — fine for
    8-bit image sinks, not for f32 golden comparisons.
    """
    s = p.shape[0]
    c, h, w = p.shape[2], p.shape[3], p.shape[4]
    acc = None
    for px in range(s):
        e = np.zeros((w, s * w), np.float32)
        e[np.arange(w), s * np.arange(w) + px] = 1.0
        t = jnp.einsum(
            "ychw,wk->ychk", p[:, px], jnp.asarray(e, p.dtype),
            precision=precision,
        )
        acc = t if acc is None else acc + t  # (s, C, H, s*W)
    out = jnp.transpose(acc, (1, 2, 0, 3)).reshape(c, s * h, s * w)
    return jnp.moveaxis(out, 0, -1)


def warp_bounded(img: jnp.ndarray, flow: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """Bilinear backward warp out(x) = img(x + flow(x)) for flows bounded
    by r pixels (larger flows are clamped to [-r, r]).

    Static (2r+2)^2-tap formulation: each tap is a static shift of the
    image weighted by per-pixel separable hat weights — pure VPU math.
    """
    fy = jnp.clip(flow[..., 0], -r, r)
    fx = jnp.clip(flow[..., 1], -r, r)
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    out = jnp.zeros_like(img)
    for dy in range(-r, r + 2):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - dy))
        row_acc = None
        for dx in range(-r, r + 2):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - dx))
            term = _shift2d(img, dy, dx) * wx
            row_acc = term if row_acc is None else row_acc + term
        out = out + row_acc * wy
    return out


def tile_shift_decompose(
    tile_shifts: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-tile float shifts -> (integer part (int32), residual float).
    Residual is in [-0.5, 0.5]."""
    rounded = jnp.round(tile_shifts)
    return rounded.astype(jnp.int32), tile_shifts - rounded


def decompose_flow(
    flow: jnp.ndarray, tile_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split a dense flow field (H, W, 2) into a per-tile integer part
    (the rounded tile mean, (nty, ntx, 2) int32) and the per-pixel
    residual (H, W, 2). warp(flow) == tile_warp_int(int) then
    warp(residual) up to border effects; the residual stays small wherever
    the flow is smooth at tile scale."""
    h, w = flow.shape[:2]
    t = tile_size
    nty, ntx = -(-h // t), -(-w // t)
    pad_h, pad_w = nty * t - h, ntx * t - w
    f = jnp.pad(flow, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
    tile_mean = f.reshape(nty, t, ntx, t, 2).mean(axis=(1, 3))
    tile_int = jnp.round(tile_mean).astype(jnp.int32)
    lifted = jnp.repeat(jnp.repeat(tile_int.astype(flow.dtype), t, 0), t, 1)[:h, :w]
    return tile_int, flow - lifted


def warp_decomposed(
    img: jnp.ndarray,
    tile_int: jnp.ndarray,
    residual: jnp.ndarray,
    tile_size: int,
    residual_bound: int = 2,
) -> jnp.ndarray:
    """Gatherless approximation of warp_backward(img, flow) for
    flow = tile_int (per tile) + residual: integer tile warp followed by
    the bounded-residual bilinear warp. Exact when |residual| <=
    residual_bound away from tile boundaries."""
    shifted = (
        tile_warp_int(img, tile_int, tile_size)
        if img.ndim == 2
        else jnp.stack(
            [tile_warp_int(img[..., c], tile_int, tile_size) for c in range(img.shape[-1])],
            axis=-1,
        )
    )
    return warp_bounded(shifted, residual, residual_bound)


def _axis_linear_resample(
    img: jnp.ndarray,
    src: jnp.ndarray,
    axis: int,
    bound: int,
    residual_bound: int | None = None,
    batch_dims: int = 0,
) -> jnp.ndarray:
    """1-D linear resample of (H, W) (plus ``batch_dims`` leading batch
    axes) along image axis ``axis`` at per-pixel AFFINE absolute source
    coordinates src (H, W): the other axis is indexed identically.
    Borders replicate (coords clamped). Gatherless, MXU-resident.

    Exact for affine maps only (every caller routes through
    similarity_warp_fast, whose grids are affine by construction). The
    map decomposes as src(l, p) = p + t(p) + c(l): a stretch profile
    t(p) = (slope - 1) * (p - center) SHARED by all orthogonal lines,
    plus a per-line offset c(l). c's integer part is applied by the
    two-level one-hot shift pass (exact for per-line-constant shifts);
    what remains is a sample at p + t(p) + phi with phi = frac(c) in
    [0, 1). Linear interpolation at t + phi reads 3 consecutive taps
    floor(p + t) + {0, 1, 2}, and the tap POSITIONS depend only on p —
    so the whole residual stage is ONE dense point-sample matmul
    (ext, 3*size) on the MXU plus an elementwise piecewise-linear
    blend in phi. This replaced a 2*rb+1-deep one-hot select loop
    (~111 full-image VPU sweeps at width 512) with ~3 matmul
    equivalents; the hoisted coarse pass now dominates the warp.

    ``residual_bound`` retains its old meaning as the stretch clamp:
    |t| <= rb, default sized for a 20-deg rotation (stretch
    1/cos20 - 1 ~ 0.064) at this image size.

    ``batch_dims`` leading axes (e.g. RGB planes stacked channel-
    LEADING) share one warp: the one-hot masks and sample matrices are
    computed once and broadcast across the batch."""
    ax = batch_dims + axis
    size = img.shape[ax]
    other = 1 - axis  # the per-line axis of the (H, W) src grid
    rb = (
        residual_bound
        if residual_bound is not None
        else max(6, int(np.ceil(0.07 * size / 2.0)))
    )
    ext = size + 2 * rb + 5  # absolute positions -(rb+2) .. size+rb+2

    # affine decomposition read off the grid ends (exact for affine)
    lo = src.take(0, axis=axis)
    hi = src.take(size - 1, axis=axis)
    slope = (hi[0] - lo[0]) / float(max(size - 1, 1))
    center = (size - 1) / 2.0
    p_vec = jnp.arange(size, dtype=jnp.float32)
    t = jnp.clip((slope - 1.0) * (p_vec - center), -rb, rb)  # (size,)
    c = (lo + hi) * 0.5 - center  # per-line offset, (lines,)

    # coarse pass: per-line integer hoist on an (rb+2)-extended domain
    # so the matmul taps address true absolute positions even at the
    # array ends; edge-replicated pads give the gather remap's index
    # clamp (replicate-border) semantics.
    hoist = jnp.clip(jnp.floor(c), -bound, bound)
    phi = jnp.clip(c - hoist, 0.0, 1.0)  # (lines,)
    pads = [(0, 0)] * img.ndim
    pads[ax] = (rb + 2, rb + 3)
    img_p = jnp.pad(img, pads, mode="edge")
    ext_shape = [0, 0]
    ext_shape[axis] = ext
    ext_shape[other] = src.shape[other]
    hoist_map = jnp.expand_dims(hoist.astype(jnp.int32), axis)
    g_ext = _axis_onehot_shift(
        img_p,
        jnp.broadcast_to(hoist_map, tuple(ext_shape)),
        bound,
        axis,
        batch_dims=batch_dims,
    )

    # residual stage: 3 point-sample taps at floor(p + t) + {0,1,2} as
    # one (ext, 3*size) 0/1 matmul (exact in f32 — each column selects
    # a single element), then blend with s = frac(p + t) + phi in
    # [0, 2): piecewise linear with the knee at s == 1.
    base = jnp.floor(p_vec + t)
    f = p_vec + t - base  # (size,), in [0, 1)
    idx = base.astype(jnp.int32) + (rb + 2)  # index into the ext axis
    iota_e = jnp.arange(ext, dtype=jnp.int32)
    m3 = jnp.concatenate(
        [
            (iota_e[:, None] == (idx + k)[None, :]).astype(img.dtype)
            for k in range(3)
        ],
        axis=1,
    )  # (ext, 3*size)
    if axis == 1:
        taps = jnp.einsum("...he,ep->...hp", g_ext, m3)
        e0, e1, e2 = jnp.split(taps, 3, axis=-1)
        s = f[None, :] + phi[:, None]
    else:
        taps = jnp.einsum("...ew,ep->...pw", g_ext, m3)
        e0, e1, e2 = jnp.split(taps, 3, axis=-2)
        s = f[:, None] + phi[None, :]
    s = s.reshape((1,) * batch_dims + s.shape)
    return jnp.where(
        s < 1.0,
        e0 * (1.0 - s) + e1 * s,
        e1 * (2.0 - s) + e2 * (s - 1.0),
    )


def _axis_onehot_direct(
    img: jnp.ndarray, smap: jnp.ndarray, bound: int, axis: int,
    prepadded: bool = False, batch_dims: int = 0,
) -> jnp.ndarray:
    """Direct one-hot select shift along one axis (2*bound+1 static
    copies): out[p] = img[p + smap[p]] along ``axis``, edge-clamped.
    Valid for ARBITRARY per-pixel maps |smap| <= bound (unlike the
    two-level decomposition in _axis_onehot_shift, which is exact only
    for maps constant along the shifted axis). ``prepadded``: the input
    already carries ``bound`` extra entries on each end of ``axis``
    (with meaningful content, not edge replicas). ``batch_dims`` leading
    img axes share the shift map and one-hot masks."""
    b = bound
    ax = batch_dims + axis
    smap = jnp.clip(smap, -b, b)

    def take(x, start, length):
        idx = (slice(None),) * ax + (slice(start, start + length),)
        return x[idx]

    if prepadded:
        padded = img
        h = img.shape[ax] - 2 * b
    else:
        h = img.shape[ax]
        pads = [(0, 0)] * img.ndim
        pads[ax] = (b, b)
        padded = jnp.pad(img, pads, mode="edge")
    stack_ = jnp.stack([take(padded, b + d, h) for d in range(-b, b + 1)], 0)
    dvals = jnp.arange(-b, b + 1)
    oh = (smap[None] == dvals.reshape((-1,) + (1,) * smap.ndim)).astype(img.dtype)
    oh = oh.reshape(
        oh.shape[:1] + (1,) * batch_dims + oh.shape[1:]
        + (1,) * (img.ndim - batch_dims - smap.ndim)
    )
    return jnp.sum(stack_ * oh, axis=0)


def default_warp_bound(h: int, w: int) -> int:
    """Default shift clamp of similarity_warp_fast: sized for ~20-deg
    corner displacement plus ~24 px of global translation at this image
    size. Shared with callers that must DETECT saturation (the clamp
    corrupts content silently, so validity masks test |src - pos| against
    this same bound — advisor finding r2)."""
    return int(np.ceil(0.35 * float(np.hypot(h / 2.0, w / 2.0)))) + 24


def similarity_warp_fast(
    img: jnp.ndarray,
    src_y: jnp.ndarray,
    src_x: jnp.ndarray,
    bound: int | None = None,
    batch_dims: int = 0,
) -> jnp.ndarray:
    """Gatherless resample of ``img`` at AFFINE source-coordinate fields
    (H, W): out(p) ~= img(src(p)), via the Catmull-Smith two-pass
    decomposition — 1-D x-resample along rows with the row-corrected
    source map u(y', x), then 1-D y-resample with src_y — each pass a
    per-pixel one-hot select (exact 1-D linear interpolation, no tile
    approximation). The affine coefficients are read off the grids by
    finite differences, so any affine field works; accuracy degrades only
    if the grids are not affine.

    A naive separable one-hot warp evaluates the y-shift map at the
    x-shifted column — for a rotation that misplaces rows by up to
    theta * |shift_x| (~9 px at 15 deg near image corners). The two-pass
    form resamples row y' at u(y', x), the x-source of the point on row
    y' that lands on output column x, which composes exactly.

    Relative shifts are clamped to ``bound`` (default sized for ~20-deg
    corner displacement plus translation at this image size); beyond it
    the warp saturates and the caller's validity mask owns the result.

    ``batch_dims`` leading img axes (e.g. RGB planes stacked channel-
    leading, (C, H, W) with batch_dims=1) share the single (H, W) source
    grid: the one-hot masks are computed once and broadcast, so C planes
    cost barely more than one.
    """
    h, w = img.shape[batch_dims], img.shape[batch_dims + 1]
    if bound is None:
        bound = default_warp_bound(h, w)
    # affine coefficients from the grids (exact for affine fields)
    a_yy = src_y[1, 0] - src_y[0, 0]
    a_yx = src_y[0, 1] - src_y[0, 0]
    e_y = src_y[0, 0]
    a_xy = src_x[1, 0] - src_x[0, 0]
    a_xx = src_x[0, 1] - src_x[0, 0]
    e_x = src_x[0, 0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # pass 1 (x): row y' contributes to output column x at source
    # u(y', x) = a_xy * (y' - a_yx*x - e_y)/a_yy + a_xx*x + e_x
    safe_a_yy = jnp.where(jnp.abs(a_yy) > 1e-6, a_yy, 1.0)
    u = a_xy * (ys - a_yx * xs - e_y) / safe_a_yy + a_xx * xs + e_x
    tmp = _axis_linear_resample(img, u, axis=1, bound=bound, batch_dims=batch_dims)
    # pass 2 (y): out(y, x) = tmp(src_y(y, x), x)
    v = a_yy * ys + a_yx * xs + e_y
    return _axis_linear_resample(tmp, v, axis=0, bound=bound, batch_dims=batch_dims)


def _axis_onehot_shift(
    img: jnp.ndarray, smap: jnp.ndarray, bound: int, axis: int,
    batch_dims: int = 0,
) -> jnp.ndarray:
    """One-hot select warp along one axis: out[y] = img[clamp(y + smap[y])]
    with |smap| <= bound (clamped). smap is per-pixel (H, W) int32 but
    piecewise-constant per tile in practice. ``batch_dims`` leading img
    axes (channel-leading planes) share the same shift map and one-hot
    masks.

    For large bounds the shift is decomposed as s = c*q + r (c ~ sqrt of
    the window) and applied in two sequential one-hot passes — nq + c
    shifted copies instead of 2*bound+1. The coarse pass produces c-1
    extra rows so the fine pass never re-clamps: for per-row-constant
    shifts the composition equals the direct form exactly; where the fine
    offset crosses a tile boundary the coarse index of the neighboring
    row is used (same tile-crossing-band caveat as the direct form).
    """
    ax = batch_dims + axis
    h = img.shape[ax]
    b = bound
    smap = jnp.clip(smap, -b, b)

    def take(x, start, length):
        idx = (slice(None),) * ax + (slice(start, start + length),)
        return x[idx]

    def onehot_mul(stack_, sel, dvals):
        oh = (sel[None] == dvals.reshape((-1,) + (1,) * sel.ndim)).astype(img.dtype)
        oh = oh.reshape(
            oh.shape[:1] + (1,) * batch_dims + oh.shape[1:]
            + (1,) * (img.ndim - batch_dims - sel.ndim)
        )
        return jnp.sum(stack_ * oh, axis=0)

    if 2 * b + 1 <= 13:
        return _axis_onehot_direct(img, smap, b, axis, batch_dims=batch_dims)

    # two-level decomposition: s = c*q + r, r in [0, c)
    c = max(2, int(np.round(np.sqrt(2 * b + 1))))
    q_lo, q_hi = -(b // c) - 1, b // c  # floor(-b/c) .. floor(b/c)
    ext = c - 1
    q_map = jnp.floor_divide(smap, c)
    r_map = smap - c * q_map  # in [0, c)

    # coarse pass on h + ext rows (edge-replicated shift map)
    pads = [(0, 0)] * img.ndim
    pads[ax] = (b + c, b + ext)
    padded = jnp.pad(img, pads, mode="edge")
    take_last = (slice(None),) * axis + (slice(h - 1, h),)
    q_ext = jnp.concatenate(
        [q_map] + [q_map[take_last]] * ext, axis=axis
    )
    stack_ = jnp.stack(
        [take(padded, b + c + c * q, h + ext) for q in range(q_lo, q_hi + 1)], 0
    )
    mid = onehot_mul(stack_, q_ext, jnp.arange(q_lo, q_hi + 1))

    # fine pass back to h rows
    stack_ = jnp.stack([take(mid, r, h) for r in range(c)], 0)
    return onehot_mul(stack_, r_map, jnp.arange(c))


def tile_warp_select(
    img: jnp.ndarray,
    int_shifts: jnp.ndarray,
    tile_size: int,
    bound: int = 16,
) -> jnp.ndarray:
    """Gatherless per-tile integer-shift warp via separable one-hot
    reduction: out = sum_d [shift_map == d] * shifted_d, per axis.

    ~8x faster than the XLA gather form on TPU (measured 0.16 ms vs
    1.3 ms per 256x512 image): the selects compile to stacked VPU
    multiply-adds instead of a general gather. Large shift windows are
    decomposed into coarse x fine one-hot passes (O(sqrt(bound)) shifted
    copies instead of O(bound), see _axis_onehot_shift). Shifts are
    clamped to +-bound; frames moving further are mis-warped by the
    excess (the robustness model then down-weights them).

    img: (H, W) or (H, W, C); int_shifts (nty, ntx, 2) int32.
    """
    h, w = img.shape[0], img.shape[1]
    t = tile_size
    ints = jnp.clip(int_shifts, -bound, bound)
    sy = jnp.repeat(jnp.repeat(ints[..., 0], t, axis=0), t, axis=1)[:h, :w]
    sx = jnp.repeat(jnp.repeat(ints[..., 1], t, axis=0), t, axis=1)[:h, :w]
    out = _axis_onehot_shift(img, sy, bound, axis=0)
    return _axis_onehot_shift(out, sx, bound, axis=1)


def tile_warp_matmul(
    imgs: jnp.ndarray,
    int_shifts: jnp.ndarray,
    tile_size: int,
    bound: int = 16,
    precision="high",
) -> jnp.ndarray:
    """Per-tile integer-shift warp as banded MXU selector matmuls.

    Same function as ``tile_warp_select`` (out[y, x] = img[clamp(y + sy),
    clamp(x + sx)] with the per-tile shifts clamped to +-bound), but the
    per-axis one-hot select is expressed as a 0/1 SELECTION MATRIX
    contraction: within one tile-column band the row selection is the
    same (h, h) matrix for every column, so the y pass is one batched
    matmul over the ntx bands — and likewise the x pass over the nty
    bands. The selection matrices are built once per shift field and
    shared by every plane in ``imgs``, so the per-plane cost is pure MXU
    work (~250 MMACs at city half-res vs ~30 one-hot VPU passes; the
    one-hot form rebuilds its masks per plane). Numerically exact for a
    0/1 selector up to matmul-precision operand rounding: "high"
    reconstructs f32 products to ~1e-6, like the phase interleave.

    imgs: (N, H, W) planes sharing ONE shift field (e.g. the CFA planes
    + validity mask of one frame); int_shifts (nty, ntx, 2) int32.
    Reference: the tile warps of convertToTilesOverlapPreShift
    (kernel.cu:323-378) — here as dense selector contractions instead of
    per-tile SIMT copies.
    """
    n, h, w = imgs.shape
    t = tile_size
    ints = jnp.clip(int_shifts, -bound, bound)
    nty, ntx = ints.shape[0], ints.shape[1]
    # pad W (and H) to full tile multiples so band reshapes are exact;
    # edge-pad keeps the clamp semantics for the overhanging pixels
    hp, wp = nty * t, ntx * t
    if hp != h or wp != w:
        imgs = jnp.pad(imgs, ((0, 0), (0, hp - h), (0, wp - w)), mode="edge")

    rows = jnp.arange(hp)
    # y selector per tile-COLUMN band j: S_y[j, i, s] = 1 iff
    # s == clamp(i + sy(tile_of(i), j), 0, h-1); clamp to the REAL h so
    # the pad rows replicate row h-1 like the one-hot form's edge clamp
    sy_rows = jnp.repeat(ints[..., 0], t, axis=0)  # (hp, ntx)
    src_y = jnp.clip(rows[:, None] + sy_rows, 0, h - 1)  # (hp, ntx)
    sel_y = (
        (src_y.T[:, :, None] == rows[None, None, :hp]).astype(imgs.dtype)
    )  # (ntx, hp_dst, hp_src)

    cols = jnp.arange(wp)
    sx_cols = jnp.repeat(ints[..., 1], t, axis=1)  # (nty, wp)
    src_x = jnp.clip(cols[None, :] + sx_cols, 0, w - 1)  # (nty, wp)
    sel_x = (
        (src_x[:, None, :] == cols[None, :wp, None]).astype(imgs.dtype)
    )  # (nty, wp_src, wp_dst)

    # y pass: band the columns by tile, contract source rows
    xb = imgs.reshape(n, hp, ntx, t)
    yb = jnp.einsum(
        "jis,nsjt->nijt", sel_y, xb, precision=precision
    ).reshape(n, hp, wp)
    # x pass: band the rows by tile, contract source columns
    rb = yb.reshape(n, nty, t, wp)
    out = jnp.einsum(
        "nrts,rsv->nrtv", rb, sel_x, precision=precision
    ).reshape(n, hp, wp)
    return out[:, :h, :w]


def tile_warp_int(
    img: jnp.ndarray, int_shifts: jnp.ndarray, tile_size: int
) -> jnp.ndarray:
    """Warp by a per-tile constant integer shift: for every pixel of tile
    t, out(x) = img(x + s_t), clamped at the borders. int_shifts is
    (nty, ntx, 2) int32 covering ceil(H/T) x ceil(W/T) tiles.

    XLA formulation: one structured gather (per-pixel indices are
    base + per-tile constants). The Pallas DMA version
    (pallas_ops.tile_warp) computes the same function without the gather.
    """
    h, w = img.shape[0], img.shape[1]
    t = tile_size
    sy = jnp.repeat(jnp.repeat(int_shifts[..., 0], t, axis=0), t, axis=1)[:h, :w]
    sx = jnp.repeat(jnp.repeat(int_shifts[..., 1], t, axis=0), t, axis=1)[:h, :w]
    ys = jnp.clip(jnp.arange(h)[:, None] + sy, 0, h - 1)
    xs = jnp.clip(jnp.arange(w)[None, :] + sx, 0, w - 1)
    return img[ys, xs]

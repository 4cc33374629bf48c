"""Geometric ops: remap, warp, rotate, resize.

TPU design notes: warps are expressed as XLA gathers over precomputed
coordinate grids (the TPU equivalent of the reference's CUDA texture
bilinear reads, e.g. opticalFlow.cu:36-43 and cv::cuda::remap
main.cpp:1139). Coordinates follow the pixel-index convention: integer
coordinate = pixel center, matching cv::remap / NPP.

Reference equivalents: cv::cuda::remap (log-polar, main.cpp:1130-1140),
WarpingKernel (opticalFlow.cu:27-44), nppiRotate (main.cpp:394-497),
bicubic upsample in BTVL1.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Clamped integer gather: img (H,W[,C]), yi/xi int arrays (...,)."""
    h, w = img.shape[0], img.shape[1]
    yi = jnp.clip(yi, 0, h - 1)
    xi = jnp.clip(xi, 0, w - 1)
    return img[yi, xi]


def remap_bilinear(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img`` at float coords (ys, xs) with bilinear interpolation
    and clamped (replicate) borders. Output shape = ys.shape (+ channels)."""
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = (ys - y0.astype(ys.dtype))
    fx = (xs - x0.astype(xs.dtype))
    if img.ndim == 3:
        fy = fy[..., None]
        fx = fx[..., None]
    p00 = _gather2d(img, y0, x0)
    p01 = _gather2d(img, y0, x0 + 1)
    p10 = _gather2d(img, y0 + 1, x0)
    p11 = _gather2d(img, y0 + 1, x0 + 1)
    top = p00 + (p01 - p00) * fx
    bot = p10 + (p11 - p10) * fx
    return top + (bot - top) * fy


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """OpenCV-convention cubic convolution weights for the 4 taps around a
    sample with fractional offset t in [0,1)."""
    # distances of the 4 taps: 1+t, t, 1-t, 2-t
    def k(x):
        ax = jnp.abs(x)
        w1 = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
        w2 = ((a * ax - 5.0 * a) * ax + 8.0 * a) * ax - 4.0 * a
        return jnp.where(ax <= 1.0, w1, jnp.where(ax < 2.0, w2, 0.0))

    return [k(t + 1.0), k(t), k(1.0 - t), k(2.0 - t)]


def remap_bicubic(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bicubic (a=-0.75, OpenCV INTER_CUBIC) resampling with clamped borders,
    the equivalent of NPP NPPI_INTER_CUBIC rotation (main.cpp:470) and
    cv::cuda::remap cubic (main.cpp:1139)."""
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = ys - y0.astype(ys.dtype)
    fx = xs - x0.astype(xs.dtype)
    wy = _cubic_weights(fy)
    wx = _cubic_weights(fx)
    if img.ndim == 3:
        wy = [w[..., None] for w in wy]
        wx = [w[..., None] for w in wx]
    out = None
    for i, wyi in enumerate(wy):
        row = None
        for j, wxj in enumerate(wx):
            p = _gather2d(img, y0 + (i - 1), x0 + (j - 1))
            term = p * wxj
            row = term if row is None else row + term
        term = row * wyi
        out = term if out is None else out + term
    return out


def remap(img, ys, xs, method: str = "bilinear"):
    if method == "bilinear":
        return remap_bilinear(img, ys, xs)
    if method == "bicubic":
        return remap_bicubic(img, ys, xs)
    if method == "nearest":
        return _gather2d(img, jnp.round(ys).astype(jnp.int32), jnp.round(xs).astype(jnp.int32))
    raise ValueError(f"unknown method {method!r}")


def static_sep_weights(coords, size: int, method: str = "bilinear"):
    """STATIC (trace-time) 1-D interpolation weights as a dense matrix.

    coords: numpy float array (N,) of absolute source coordinates along an
    axis of length ``size``. Returns (N, size) float32 W such that
    W @ v == [interp(v, c) for c in coords] with clamped (replicate)
    borders — numerically identical to the corresponding remap() kernel.

    Rationale (TPU): a remap with STATIC maps is a fixed linear operator;
    separable interpolation factors it into two small dense matmuls that
    run on the MXU instead of a per-pixel gather, which executes at ~9
    cycles/element on the VPU (measured ~1 ms for even a 128x64 log-polar
    remap — the dominant cost of the pre-alignment estimator in round 2).
    """
    import numpy as np

    c = np.asarray(coords, np.float64).reshape(-1)
    n = c.shape[0]
    w = np.zeros((n, size), np.float64)
    rows_idx = np.arange(n)
    if method == "nearest":
        idx = np.clip(np.round(c).astype(np.int64), 0, size - 1)
        w[rows_idx, idx] = 1.0
        return w.astype(np.float32)
    c0 = np.floor(c).astype(np.int64)
    f = c - c0
    if method == "bilinear":
        taps = [(0, 1.0 - f), (1, f)]
    elif method == "bicubic":
        a = -0.75

        def k(x):
            ax = np.abs(x)
            w1 = ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0
            w2 = ((a * ax - 5.0 * a) * ax + 8.0 * a) * ax - 4.0 * a
            return np.where(ax <= 1.0, w1, np.where(ax < 2.0, w2, 0.0))

        taps = [(-1, k(1.0 + f)), (0, k(f)), (1, k(1.0 - f)), (2, k(2.0 - f))]
    else:
        raise ValueError(f"unknown method {method!r}")
    for d, wt in taps:
        idx = np.clip(c0 + d, 0, size - 1)
        np.add.at(w, (rows_idx, idx), wt)
    return w.astype(np.float32)


def remap_static(img: jnp.ndarray, wy, wx, out_shape) -> jnp.ndarray:
    """Apply a static remap given separable weight matrices from
    static_sep_weights: wy (N, H), wx (N, W), N = prod(out_shape).
    img: (..., H, W) -> (..., *out_shape). Two MXU contractions, zero
    gathers; exact bilinear/bicubic per the weight construction."""
    wy = jnp.asarray(wy)
    wx = jnp.asarray(wx)
    t = jnp.einsum("...hw,nw->...hn", img, wx)      # (..., H, N) matmul
    out = jnp.sum(t * wy.T, axis=-2)                # (..., N)
    return out.reshape(img.shape[:-2] + tuple(out_shape))


def identity_grid(h: int, w: int, dtype=jnp.float32):
    """(ys, xs) pixel-center index grids of shape (h, w)."""
    ys = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    xs = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return ys, xs


def warp_backward(img: jnp.ndarray, flow: jnp.ndarray, method: str = "bilinear") -> jnp.ndarray:
    """Backward-warp ``img`` by a dense flow field (H, W, 2) ordered
    (dy, dx): out(p) = img(p + flow(p)). Equivalent of WarpingKernel
    (opticalFlow.cu:27-44)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = identity_grid(h, w, flow.dtype)
    return remap(img, ys + flow[..., 0], xs + flow[..., 1], method)


def translate(img: jnp.ndarray, dy, dx, method: str = "bilinear") -> jnp.ndarray:
    """Sample img at (y+dy, x+dx): shifts the scene by (-dy, -dx)."""
    h, w = img.shape[0], img.shape[1]
    ys, xs = identity_grid(h, w)
    return remap(img, ys + dy, xs + dx, method)


def rotate(
    img: jnp.ndarray,
    angle_rad: float,
    method: str = "bicubic",
    center: tuple | None = None,
    expand: bool = False,
) -> jnp.ndarray:
    """Rotate about the image center, equivalent of the NPP rotate demo
    (main.cpp:394-497, boxFilterNPP.cpp:282-297).

    expand=False keeps the output size (content clipped at corners).
    expand=True grows the canvas to the rotated bounding box — the
    nppiGetRotateBound behavior of the reference's demo
    (boxFilterNPP.cpp:282-297) — with the rotated content centered.
    The bound is static for a static angle, so the expanded form stays
    jittable; ``angle_rad`` must then be a Python scalar (the output
    SHAPE depends on it) and ``center`` is ignored."""
    import numpy as _np

    h, w = img.shape[0], img.shape[1]
    if expand:
        a = float(angle_rad)
        ca_a, sa_a = abs(_np.cos(a)), abs(_np.sin(a))
        # epsilon guards exact multiples of 90 deg, where the rotated
        # extent lands on an integer up to f64 rounding (5*cos(pi/2)
        # ~ 3e-16 would otherwise ceil one pixel too far)
        oh = int(_np.ceil(h * ca_a + w * sa_a - 1e-9))
        ow = int(_np.ceil(w * ca_a + h * sa_a - 1e-9))
        cy_in, cx_in = (h - 1) / 2.0, (w - 1) / 2.0
        cy_out, cx_out = (oh - 1) / 2.0, (ow - 1) / 2.0
    else:
        oh, ow = h, w
        if center is None:
            cy_in, cx_in = (h - 1) / 2.0, (w - 1) / 2.0
        else:
            cy_in, cx_in = center
        cy_out, cx_out = cy_in, cx_in
    ys, xs = identity_grid(oh, ow)
    ca = jnp.cos(angle_rad)
    sa = jnp.sin(angle_rad)
    yr = ys - cy_out
    xr = xs - cx_out
    src_y = cy_in + sa * xr + ca * yr
    src_x = cx_in + ca * xr - sa * yr
    return remap(img, src_y, src_x, method)


def resize(img: jnp.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> jnp.ndarray:
    """Resize with OpenCV pixel-center alignment: src = (dst+0.5)*scale-0.5."""
    h, w = img.shape[0], img.shape[1]
    sy = h / out_h
    sx = w / out_w
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * sy - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * sx - 0.5
    ys = jnp.broadcast_to(ys[:, None], (out_h, out_w))
    xs = jnp.broadcast_to(xs[None, :], (out_h, out_w))
    return remap(img, ys, xs, method)


def upscale(img: jnp.ndarray, scale: int, method: str = "bicubic") -> jnp.ndarray:
    return resize(img, img.shape[0] * scale, img.shape[1] * scale, method)


def downscale(img: jnp.ndarray, scale: int, method: str = "bilinear") -> jnp.ndarray:
    return resize(img, img.shape[0] // scale, img.shape[1] // scale, method)


def pool_cols_mxu(x: jnp.ndarray, ds: int) -> jnp.ndarray:
    """Mean-pool the MINOR (lane) axis by ``ds`` as an MXU matmul.

    A lane-axis reshape+reduce (``x.reshape(..., hw, ds).mean(-1)``)
    lowers to a lane-crossing relayout copy on TPU (~54 us for one
    256x512 f32 plane on v5e, round-3 device trace); contracting the
    already-minor axis against a constant 1/ds pooling matrix keeps
    every operand in its native layout. precision="high" (bf16x3)
    reconstructs the f32 products to ~2^-21 relative — exact enough for
    the pyramid/estimation consumers of a mean pool."""
    import numpy as np

    w = x.shape[-1]
    hw = w // ds
    x = x[..., : hw * ds]
    m = np.zeros((hw * ds, hw), np.float32)
    m[np.arange(hw * ds), np.repeat(np.arange(hw), ds)] = 1.0 / ds
    return jnp.einsum(
        "...w,wk->...k", x, jnp.asarray(m, x.dtype), precision="high"
    )


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool decimation (pyramid builder). Matches the reference
    pyramid's half-resolution convention (deBayersSubSample3-style)."""
    h, w = img.shape[0], img.shape[1]
    h2, w2 = h // 2, w // 2
    x = img[: h2 * 2, : w2 * 2]
    if img.ndim == 2:
        # rows: (h2, 2, w) splits a MAJOR axis (free view) + sublane add;
        # cols: MXU pooling matmul (a lane-axis reshape would relayout)
        rows = x.reshape(h2, 2, w2 * 2).mean(axis=1)
        return pool_cols_mxu(rows, 2)
    c = img.shape[2]
    return x.reshape(h2, 2, w2, 2, c).mean(axis=(1, 3))


def upsample_zero(img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Zero-stuffing upsample (transpose of strided decimation), used by the
    BTV-L1 adjoint operator chain."""
    h, w = img.shape[0], img.shape[1]
    if img.ndim == 2:
        out = jnp.zeros((h * scale, w * scale), img.dtype)
        return out.at[::scale, ::scale].set(img)
    c = img.shape[2]
    out = jnp.zeros((h * scale, w * scale, c), img.dtype)
    return out.at[::scale, ::scale, :].set(img)

"""Linear filters: Gaussian, box, Laplacian sharpen, unsharp mask.

TPU design notes: all spatial filters lower to ``lax.conv_general_dilated``
with depthwise feature groups so XLA tiles them onto the MXU/VPU; separable
kernels are applied as two rank-1 convs to keep FLOPs minimal.

Reference equivalents: gaussin_filter_1D (main.cpp:370-391,
boxFilterNPP.cpp:78-99), sharpenImg2 Laplacian sharpen
(multi_frame_sr.cpp:90-119), sharpenImg unsharp mask (main.cpp:500-566),
NPP boxFilter (boxFilterNPP sample), boxFilterWithBorderX/Y
(kernel.cu:148-218).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax import lax


def gaussian_kernel_1d(sigma: float, size: int | None = None) -> np.ndarray:
    """Normalized 1-D Gaussian taps. ``size`` defaults to 2*ceil(3*sigma)+1,
    mirroring the sigma-derived sizing of gaussin_filter_1D
    (main.cpp:370-391)."""
    if size is None:
        size = 2 * int(math.ceil(3.0 * sigma)) + 1
    if size % 2 == 0:
        size += 1
    half = size // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _to_nchw(img: jnp.ndarray):
    """(H,W) | (H,W,C) | (N,H,W,C) -> (N,C,H,W) + restore fn."""
    if img.ndim == 2:
        x = img[None, None]
        restore = lambda y: y[0, 0]
    elif img.ndim == 3:
        x = jnp.transpose(img, (2, 0, 1))[None]
        restore = lambda y: jnp.transpose(y[0], (1, 2, 0))
    elif img.ndim == 4:
        x = jnp.transpose(img, (0, 3, 1, 2))
        restore = lambda y: jnp.transpose(y, (0, 2, 3, 1))
    else:
        raise ValueError(f"unsupported rank {img.ndim}")
    return x, restore


def _pad_replicate(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """Edge-replicate pad of an NCHW tensor, matching the clamped-index
    borders the reference kernels use (e.g. kernel.cu:312-313)."""
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)), mode="edge")


def conv2d(img: jnp.ndarray, kernel: jnp.ndarray, border: str = "replicate") -> jnp.ndarray:
    """Depthwise 2-D correlation with SAME output size.

    ``kernel`` is (kh, kw) and shared across channels. ``border`` is
    "replicate" (clamped, reference default) or "zero".
    """
    x, restore = _to_nchw(img)
    kh, kw = kernel.shape
    c = x.shape[1]
    k = jnp.broadcast_to(kernel[None, None], (c, 1, kh, kw)).astype(x.dtype)
    if border == "replicate":
        x = _pad_replicate(x, kh // 2, kw // 2)
        pad = "VALID"
    else:
        pad = "SAME"
    y = lax.conv_general_dilated(
        x, k, (1, 1), pad, feature_group_count=c, precision=lax.Precision.HIGHEST
    )
    return restore(y)


def _band_matrix(n: int, taps: np.ndarray, border: str) -> np.ndarray:
    """(n, n) matrix applying a 1-D correlation with the given taps and
    border handling: out[i] = sum_t taps[t] * img[border(i + t - r)]."""
    k = len(taps)
    r = k // 2
    b = np.zeros((n, n), np.float32)
    for t in range(k):
        src = np.arange(n) + t - r
        if border == "replicate":
            src = np.clip(src, 0, n - 1)
            np.add.at(b, (np.arange(n), src), float(taps[t]))
        else:  # zero
            ok = (src >= 0) & (src < n)
            np.add.at(b, (np.arange(n)[ok], src[ok]), float(taps[t]))
    return b


# Above this edge length a banded matmul does too many useless FLOPs
# (cost n/k vs the conv's taps); below it the MXU beats the VPU/conv
# lowering by a wide margin for depthwise few-channel filters.
_BAND_MATMUL_MAX_DIM = 1024


def _filter_axis(img: jnp.ndarray, taps, axis: int, border: str) -> jnp.ndarray:
    """1-D correlation along `axis` (0 or 1 of the image plane).

    TPU note: depthwise grouped convs with few channels lower poorly
    (the MXU wants dense contractions), so for small static edge lengths
    the filter is applied as a banded-matrix matmul — one dense MXU
    contraction with the border semantics baked into the band.

    Channel-minor (H, W, C<=8) inputs are transposed to channel-LEADING
    for the contraction: a C-wide minor axis occupies 128 padded lanes on
    TPU (measured 0.55 ms for a 3x3 box on a 128x256x3 structure tensor —
    ~40x the plane-leading cost); adjacent inverse transposes of the two
    separable passes cancel in XLA."""
    n = img.shape[axis]
    try:
        taps_np = np.asarray(taps, np.float32).reshape(-1)
    except Exception:  # traced taps: stay on the conv path
        kern = jnp.reshape(taps, (-1, 1)) if axis == 0 else jnp.reshape(taps, (1, -1))
        return conv2d(img, kern, border)
    if n <= _BAND_MATMUL_MAX_DIM:
        b = jnp.asarray(_band_matrix(n, taps_np, border))
        if img.ndim == 2:
            sub = "ij,jw->iw" if axis == 0 else "ij,hj->hi"
            return jnp.einsum(sub, b, img, precision=lax.Precision.HIGHEST)
        if img.ndim == 3 and img.shape[-1] <= 8:
            x = jnp.moveaxis(img, -1, 0)  # (C, H, W): W on the lane dim
            sub = "ij,cjw->ciw" if axis == 0 else "ij,chj->chi"
            y = jnp.einsum(sub, b, x, precision=lax.Precision.HIGHEST)
            return jnp.moveaxis(y, 0, -1)
        sub = "ij,jwc->iwc" if axis == 0 else "ij,hjc->hic"
        return jnp.einsum(sub, b, img, precision=lax.Precision.HIGHEST)
    kern = taps_np.reshape(-1, 1) if axis == 0 else taps_np.reshape(1, -1)
    return conv2d(img, jnp.asarray(kern), border)


def separable_filter(
    img: jnp.ndarray, ky: jnp.ndarray, kx: jnp.ndarray, border: str = "replicate"
) -> jnp.ndarray:
    """Apply a separable filter along rows then columns (see _filter_axis
    for the banded-matmul TPU lowering)."""
    return _filter_axis(_filter_axis(img, ky, 0, border), kx, 1, border)


def gaussian_blur(img: jnp.ndarray, sigma: float, size: int | None = None) -> jnp.ndarray:
    k = jnp.asarray(gaussian_kernel_1d(sigma, size))
    return separable_filter(img, k, k)


def box_filter(img: jnp.ndarray, size: int, normalize: bool = True) -> jnp.ndarray:
    """Box filter (NPP boxFilter / kernel.cu:148-218 equivalent).

    Uniform taps admit a sliding-sum lowering: per axis one cumsum plus
    one static-shift subtract — O(1) work per element on the VPU, beating
    both the conv and the banded-matmul lowerings for the wide windows
    the LK refinement uses (17x17). Borders replicate, matching
    separable_filter(ones) exactly: the cumsum runs on an edge-padded
    array so clamped taps re-count the border sample.

    Small windows take a direct shift-sum instead: the full-axis f32
    cumsum's cancellation error grows with the image extent (~1.4e-5 at
    512 px) and would swamp tiny local variances (robustness_mask's 3x3
    statistics of flat regions); k shifted adds are both exact-enough
    and cheap when k is small."""
    if img.ndim == 3 and img.shape[-1] <= 8:
        # channel-minor layouts pad C up to 128 lanes on TPU; process
        # channel-leading (see _filter_axis note)
        return jnp.moveaxis(
            box_filter_planes(jnp.moveaxis(img, -1, 0), size, normalize), 0, -1
        )
    if size <= 7:
        taps = np.ones((size,), np.float32)
        out = separable_filter(img, jnp.asarray(taps), jnp.asarray(taps))
        if normalize:
            out = out / float(size * size)
        return out
    r = size // 2

    def axis_sum(x, axis):
        pads = [(0, 0)] * x.ndim
        pads[axis] = (r + 1, r)
        xp = jnp.pad(x, pads, mode="edge")
        cs = jnp.cumsum(xp, axis=axis)
        n = x.shape[axis]
        lo = lax.slice_in_dim(cs, 0, n, axis=axis)
        hi = lax.slice_in_dim(cs, size, size + n, axis=axis)
        return hi - lo

    out = axis_sum(axis_sum(img, 0), 1)
    if normalize:
        out = out / float(size * size)
    return out


def box_filter_planes(
    x: jnp.ndarray, size: int, normalize: bool = True, mxu_bf16: bool = False
) -> jnp.ndarray:
    """Box filter over the LAST TWO axes of (..., H, W) — the
    channel/batch-LEADING layout TPU wants (W stays on the lane dim).
    Same numerics as box_filter (banded matmul for small windows,
    edge-padded sliding cumsum for wide ones).

    ``mxu_bf16``: lower via bfloat16 banded matmuls with f32 MXU
    accumulation for ANY window size. The ones-taps band is exact in
    bf16 and the MXU accumulates in f32, so the only error is the input
    quantization (~2^-8 relative) — numerically SAFER than a bf16
    cumsum (whose running sum cancels catastrophically) and it moves
    the wide-window sums off the VPU onto the MXU."""
    h, w = x.shape[-2], x.shape[-1]
    if mxu_bf16 and max(h, w) <= _BAND_MATMUL_MAX_DIM:
        taps = np.ones((size,), np.float32)
        bh = jnp.asarray(_band_matrix(h, taps, "replicate"), jnp.bfloat16)
        bw = jnp.asarray(_band_matrix(w, taps, "replicate"), jnp.bfloat16)
        x16 = x.astype(jnp.bfloat16)
        y = jnp.einsum(
            "ij,...jw->...iw", bh, x16, preferred_element_type=jnp.float32
        )
        y = jnp.einsum(
            "ij,...hj->...hi", bw, y.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    elif size <= 7 and max(h, w) <= _BAND_MATMUL_MAX_DIM:
        taps = np.ones((size,), np.float32)
        bh = jnp.asarray(_band_matrix(h, taps, "replicate"))
        bw = jnp.asarray(_band_matrix(w, taps, "replicate"))
        y = jnp.einsum("ij,...jw->...iw", bh, x, precision=lax.Precision.HIGHEST)
        y = jnp.einsum("ij,...hj->...hi", bw, y, precision=lax.Precision.HIGHEST)
    else:
        r = size // 2

        def axis_sum(v, axis):
            pads = [(0, 0)] * v.ndim
            pads[axis] = (r + 1, r)
            vp = jnp.pad(v, pads, mode="edge")
            cs = jnp.cumsum(vp, axis=axis)
            n = v.shape[axis]
            lo = lax.slice_in_dim(cs, 0, n, axis=axis)
            hi = lax.slice_in_dim(cs, size, size + n, axis=axis)
            return hi - lo

        y = axis_sum(axis_sum(x, x.ndim - 2), x.ndim - 1)
    if normalize:
        y = y / float(size * size)
    return y


def laplacian_sharpen(img: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian sharpen with zeroed 1-px borders, the exact
    behavior of sharpenImg2 (multi_frame_sr.cpp:90-119): out = clamp(5*c -
    left - right - up - down), border rows/cols set to 0."""
    k = jnp.asarray([[0.0, -1.0, 0.0], [-1.0, 5.0, -1.0], [0.0, -1.0, 0.0]], img.dtype)
    out = conv2d(img, k, border="replicate")
    out = jnp.clip(out, 0.0, 1.0)
    h, w = img.shape[0], img.shape[1]
    mask = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    if img.ndim == 3:
        mask = mask[..., None]
    return jnp.where(mask, out, 0.0)


def unsharp_mask(img: jnp.ndarray, sigma: float = 1.0, amount: float = 1.0) -> jnp.ndarray:
    """Unsharp masking (sharpenImg, main.cpp:507-535 equivalent)."""
    blurred = gaussian_blur(img, sigma)
    return jnp.clip(img + amount * (img - blurred), 0.0, 1.0)

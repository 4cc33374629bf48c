"""Post-merge restoration filter (round 4).

The merge reconstructs the box-prefiltered HR field accurately but
cannot undo the sampling prefilter itself (2x2 sensor box + warp
interpolation + merge kernel): on the true-HR synthetic protocol the
no-deconvolution ceiling is PSNR(HR, box2*HR) = 31.0 dB while the
order-1 merge reaches ~30.3 dB vs box2*HR. This module applies a FIXED
7x7 FIR fitted by tools/fit_restore.py: a radially-binned Wiener gain
g(w) = <HR.S*>/<|S|^2> computed on a calibration burst (city, seed 7),
inverse-transformed and DC-normalized. The SHIPPED kernel is the
DC-renormalized rank-2 truncated SVD of that fit (round 5): it measures
BETTER than the full fit (27.66 vs 27.58 dB true-HR — the rank tail is
fit noise) and lowers separably. Measured transfer of the full fit on
held-out bursts: city seed19 +0.58 dB, car-scene burst +0.97 dB, calib
+0.54 dB; noisy-HR iso burst -0.19 dB (sharpening vs noise tradeoff —
disable via HandheldConfig.final_restore for very noisy inputs).

The reference pipeline also sharpens its SR output unconditionally
(sharpenImg2 Laplacian after BTVL1, multi_frame_sr.cpp:207-209;
fourierFilter radial boost in the latent pipeline, kernel.cu:792-869) —
this is that stage, calibrated against ground truth instead of
hand-tuned.

Layout: `restore_phases` applies the filter POLYPHASE on the
channel-leading phase planes (n, n, C, H, W) so it fuses into the merge
finalize before the single interleave; each (output-phase, tap) pair is
a static shift x scalar multiply on a (C, H, W) plane — pure VPU math,
no relayouts. `restore_image` is the output-resolution oracle form.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# fit by tools/fit_restore.py on the order-1 fast RAW pipeline output
# (city burst, seed 7, 2x); DC-normalized, 4-fold symmetric
RESTORE_KERNEL_FIT = np.array([
    [0.004845, -0.028202, -0.016631, -0.007837, -0.016631, -0.028202, 0.004845],
    [-0.028286, -0.001758, -0.025565, -0.048270, -0.025565, -0.001758, -0.028286],
    [-0.016577, -0.025510, 0.010336, 0.234416, 0.010336, -0.025510, -0.016577],
    [-0.007857, -0.048323, 0.234462, 0.796216, 0.234462, -0.048323, -0.007857],
    [-0.016577, -0.025510, 0.010336, 0.234416, 0.010336, -0.025510, -0.016577],
    [-0.028286, -0.001758, -0.025565, -0.048270, -0.025565, -0.001758, -0.028286],
    [0.004845, -0.028202, -0.016631, -0.007837, -0.016631, -0.028202, 0.004845],
], dtype=np.float32)

# EFFECTIVE kernel (round 5): the DC-renormalized rank-2 truncated SVD of
# the fit. Measured BETTER than the full fit on the true-HR protocol
# (27.66 vs 27.58 dB — the rank tail is mostly fit noise) and exactly
# separable, so the polyphase form lowers as two 1-D passes per rank:
# 448 slice-FMA terms instead of 784 at n=4.
_U, _S, _Vt = np.linalg.svd(RESTORE_KERNEL_FIT.astype(np.float64))
_K2 = (_U[:, :2] * _S[:2]) @ _Vt[:2]
RESTORE_KERNEL = (_K2 / _K2.sum()).astype(np.float32)
# rank factors: sum_r outer(uy_r, vx_r) == RESTORE_KERNEL
RESTORE_FACTORS = tuple(
    (
        (_U[:, r] * _S[r] / _K2.sum()).astype(np.float32),
        _Vt[r].astype(np.float32),
    )
    for r in range(2)
)


def _shift_last2(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped static shift of the last two axes."""
    h, w = img.shape[-2], img.shape[-1]
    pad = max(abs(dy), abs(dx), 1)
    pads = ((0, 0),) * (img.ndim - 2) + ((pad, pad), (pad, pad))
    xp = jnp.pad(img, pads, mode="edge")
    return xp[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def restore_image(img: jnp.ndarray, kernel: np.ndarray | None = None,
                  gain: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply the restoration FIR at output resolution.

    img: (H, W, C) or (H, W). Channel-minor entry is fine here — the
    shifts ride the leading two axes after a moveaxis; used by the
    oracle (gather-based) pipelines where layout is not the bottleneck.
    out[y, x] = sum_uv k[u, v] * img[y - u + r, x - v + r].
    ``gain``: optional traced scalar — returns the noise-gated lerp
    (1-g)*img + g*restored (see restore_phases).
    """
    if gain is not None:
        return img + gain * (restore_image(img, kernel) - img)
    k = RESTORE_KERNEL if kernel is None else kernel
    kh, kw = k.shape
    r_y, r_x = kh // 2, kw // 2
    chan = img.ndim == 3
    x = jnp.moveaxis(img, -1, 0) if chan else img
    out = None
    for u in range(kh):
        for v in range(kw):
            c = float(k[u, v])
            if c == 0.0:
                continue
            # true convolution (matches the scipy validation in
            # tools/fit_restore.py; the fitted kernel is symmetric, so
            # correlation would coincide — keep the exact form anyway)
            term = _shift_last2(x, r_y - u, r_x - v) * c
            out = term if out is None else out + term
    return jnp.moveaxis(out, 0, -1) if chan else out


def restore_phases(planes: jnp.ndarray, kernel: np.ndarray | None = None,
                   gain: jnp.ndarray | None = None) -> jnp.ndarray:
    """Polyphase restoration on channel-leading phase planes.

    planes: (n, n, C, H, W) where n is the total upsampling factor and
    plane (p, q) holds output pixels (n*i + p, n*j + q). Equivalent to
    interleave -> restore_image -> de-interleave (up to the border
    rows/cols, where the edge clamp acts per-plane, i.e. replicates
    whole n-pixel blocks instead of single output pixels).

    Lowered as scalar-coefficient SLICES of one padded phase stack:
    out_p = sum_{q,m} W[p,q,m] * xpad[q, i+m] (the phase-pair tap table
    `_polyphase_conv_kernel`). Each term is a static slice x scalar FMA
    that XLA fuses into a few VPU passes — measured 0.14 ms vs 0.30 ms
    for the equivalent 16->16-channel conv_general_dilated at city size
    (the conv also ran its contraction at default (bf16) matmul
    precision: 4e-3 max abs deviation; the slice form is exact f32).
    An earlier per-tap _shift_last2 unroll (pad per tap) was what took
    XLA minutes to fuse — the single shared pad is what makes this form
    compile fast, not the op count.

    ``gain``: optional traced scalar g in [0, 1] — returns the lerp
    (1-g)*planes + g*restored FUSED into the final accumulation pass
    (the separable path scales its y-pass terms by g and folds
    (1-g)*planes into the same sum), avoiding the extra full-stack
    read-modify-write an external lerp costs (~0.05-0.1 ms/burst at
    city size, round-5 k=24 differencing). Used by the noise-adaptive
    restore gate (models.handheld._gated_restore).
    """
    if kernel is None:
        # the default kernel is exactly rank-2 — lower it separably
        return _restore_phases_separable(planes, RESTORE_FACTORS, gain=gain)
    if gain is not None:
        return planes + gain * (restore_phases(planes, kernel) - planes)
    k = kernel
    n, _, c, h, w = planes.shape
    wk, m_rad = _polyphase_conv_kernel(np.asarray(k, np.float32), n)
    # edge-clamped halo mirrors _shift_last2's replicate border
    xpad = jnp.pad(
        planes.reshape(n * n, c, h, w),
        ((0, 0), (0, 0), (m_rad, m_rad), (m_rad, m_rad)),
        mode="edge",
    )
    outs = []
    for p in range(n * n):
        acc = None
        for q in range(n * n):
            for my in range(2 * m_rad + 1):
                for mx in range(2 * m_rad + 1):
                    coef = float(wk[p, q, my, mx])
                    if coef == 0.0:
                        continue
                    term = coef * xpad[q, :, my : my + h, mx : mx + w]
                    acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, 0).reshape(n, n, c, h, w)


def _polyphase_taps_1d(v: np.ndarray, n: int):
    """1-D polyphase tap table for total upsampling factor n:
    W[p, q, m] such that out_p[i] = sum_q sum_m W[p,q,m] plane_q[i+m]
    (spatial index offset by +m_rad)."""
    kh = len(v)
    r = kh // 2
    m_rad = (r + n - 1) // n
    w = np.zeros((n, n, 2 * m_rad + 1), np.float32)
    for p in range(n):
        for t in range(-r, r + 1):
            q, m = (p - t) % n, (p - t) // n
            w[p, q, m + m_rad] += v[t + r]
    return w, m_rad


def _restore_phases_separable(planes: jnp.ndarray, factors,
                              gain: jnp.ndarray | None = None) -> jnp.ndarray:
    """Separable polyphase restoration: for each rank (uy, vx) run a 1-D
    x-pass then a 1-D y-pass over the phase planes and sum the ranks.
    Each pass is 7 static slice x scalar FMAs per output phase (vs 49 for
    the dense polyphase), with the same per-plane edge clamp.
    ``gain``: see restore_phases — scales every y-pass term by the traced
    scalar and seeds the accumulator with (1-gain)*planes, so the gated
    lerp rides the same fused accumulation."""
    n = planes.shape[0]
    h, w = planes.shape[-2], planes.shape[-1]
    out = None
    if gain is not None:
        out = [
            [(1.0 - gain) * planes[p, px] for px in range(n)]
            for p in range(n)
        ]
    for uy, vx in factors:
        wx, mx_rad = _polyphase_taps_1d(np.asarray(vx, np.float32), n)
        wy, my_rad = _polyphase_taps_1d(np.asarray(uy, np.float32), n)
        xpad = jnp.pad(
            planes,
            ((0, 0),) * 4 + ((mx_rad, mx_rad),),
            mode="edge",
        )
        xp = []  # x-filtered, indexed by out x-phase
        for p in range(n):
            acc = None
            for q in range(n):
                for m in range(2 * mx_rad + 1):
                    coef = float(wx[p, q, m])
                    if coef == 0.0:
                        continue
                    term = coef * xpad[:, q, ..., m : m + w]
                    acc = term if acc is None else acc + term
            xp.append(acc)  # (n_yin, C, H, W)
        ypad = [
            jnp.pad(
                x, ((0, 0), (0, 0), (my_rad, my_rad), (0, 0)), mode="edge"
            )
            for x in xp
        ]
        for p in range(n):
            for px in range(n):
                acc = None
                for q in range(n):
                    for m in range(2 * my_rad + 1):
                        coef = float(wy[p, q, m])
                        if coef == 0.0:
                            continue
                        cf = coef if gain is None else coef * gain
                        term = cf * ypad[px][q, :, m : m + h]
                        acc = term if acc is None else acc + term
                if out is None:
                    out = [[None] * n for _ in range(n)]
                cur = out[p][px]
                out[p][px] = acc if cur is None else cur + acc
    return jnp.stack([jnp.stack(row, 0) for row in out], 0)


def temporal_noise_stat(gray: jnp.ndarray, flows: jnp.ndarray | None = None,
                        residual: jnp.ndarray | None = None,
                        step: int = 8) -> jnp.ndarray:
    """Robust per-burst noise statistic from REGISTERED luma frames.

    gray: (F, H, W) luma stack, frame 0 the reference, alternates already
    warped to reference geometry (or ``flows`` (F, H, W, 2) given, in
    which case each alternate is integer-shifted by its rounded flow
    first — the oracle paths' convention). Returns the median of
    |alt - ref| over the flattest ~30% of a ``step``-subsampled pixel
    grid and all alternates: a robust location of the temporal noise
    floor. Texture does NOT inflate it (unlike spatial Laplacian
    estimators, where the clean-but-detailed synthetic burst outscores
    the noisy iso burst — round-5 measurement), and the flat-region
    restriction removes the subpixel-residual * gradient term that
    integer-precision registration leaves on texture. Misaligned edges
    and moving objects inflate the upper tail only.
    The reference models per-frame noise with
    sigma_md = sqrt(alpha*mean + beta) (RobustnessModell.cu:130-132);
    this is the data-driven analog used to gate the restoration FIR.
    """
    ref = gray[0]
    moved = gray[1:]
    if flows is not None:
        h, w = ref.shape
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]

        def shift_one(img, fl):
            yi = jnp.clip(ys + jnp.round(fl[..., 0]).astype(jnp.int32), 0, h - 1)
            xi = jnp.clip(xs + jnp.round(fl[..., 1]).astype(jnp.int32), 0, w - 1)
            return img[yi, xi]

        import jax

        moved = jax.vmap(shift_one)(moved, flows[1:])
        residual = flows[1:] - jnp.round(flows[1:])
    # SUBPIXEL COMPENSATION: the frames are registered only to integer
    # precision, so moved - ref ~= -res . grad(ref) + noise on texture —
    # a signal term the noise statistic must not count (round-5
    # calibration: it put the clean-but-detailed synthetic burst above
    # the noisy iso burst). The pipeline knows the residual flow —
    # subtract the first-order term before taking the magnitude.
    gy, gx = jnp.gradient(ref)
    d = moved - ref
    if residual is not None:
        d = d + residual[..., 0] * gy + residual[..., 1] * gx
    d = jnp.abs(d)[:, 1:-1, 1:-1]
    # FLAT-REGION restriction (second defense, for the higher-order
    # interpolation terms compensation cannot reach): keep the flattest
    # ~30% of a subsampled grid and read the 15th percentile of |diff|
    # over the masked stack — the median of the flat subset, where the
    # difference is noise alone. The grid is subsampled aggressively
    # (``step``): quantiles lower to SORTS on TPU, and a ~2k-sample
    # quantile estimate is plenty for a [0,1]-clipped gate (the k=16
    # variant bench priced the step=2 sorts at ~0.2-0.3 ms/burst).
    step = max(1, min(step, min(d.shape[-2], d.shape[-1]) // 8))
    gm = jnp.abs(gy) + jnp.abs(gx)
    gm_s = gm[1:-1, 1:-1][::step, ::step]
    d_s = d[:, ::step, ::step]
    t = jnp.percentile(gm_s, 30.0)
    d_masked = jnp.where(gm_s[None] <= t, d_s, jnp.inf)
    return jnp.percentile(d_masked, 15.0)


def restore_gain(stat: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    """Noise-adaptive restoration strength: 1 below ``lo`` (clean burst,
    full deconvolution), 0 above ``hi`` (noise-dominated burst — the
    Wiener FIR would amplify noise, measured -0.19 dB true-HR on the
    noisy-HR iso protocol), linear in between. Callers lerp:
    out = x + g * (restore(x) - x)."""
    return jnp.clip((hi - stat) / max(hi - lo, 1e-9), 0.0, 1.0)


def _polyphase_conv_kernel(k: np.ndarray, n: int):
    """Dense polyphase conv kernel for total upsampling factor n:
    W[p, q, m] such that out_p[i] = sum_q sum_m W[p,q,m] plane_q[i+m].
    Shape (n^2 out-phase, n^2 in-phase, mk, mk), phase index p = py*n+px;
    the spatial index m is offset by +m_rad (W[..., m + m_rad])."""
    kh = k.shape[0]
    r = kh // 2
    m_rad = (r + n - 1) // n
    mk = 2 * m_rad + 1
    w = np.zeros((n * n, n * n, mk, mk), np.float32)
    for py in range(n):
        for px in range(n):
            for ty in range(-r, r + 1):
                qy, my = (py - ty) % n, (py - ty) // n
                for tx in range(-r, r + 1):
                    qx, mx = (px - tx) % n, (px - tx) // n
                    w[py * n + px, qy * n + qx, my + m_rad, mx + m_rad] += (
                        k[ty + r, tx + r]
                    )
    return w, m_rad

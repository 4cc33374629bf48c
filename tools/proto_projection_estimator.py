"""Prototype: projection-based rotation/scale estimation (no log-polar
gather). Accuracy check vs the existing log-polar estimator and ground
truth on synthetic rotated/scaled pairs at the prealign estimation
resolution (64x128).

Idea: |F| of a rotated+scaled image is the rotated (by theta, circular
with period pi) and radially 1/s-scaled |F| of the original. Instead of
resampling |F| onto a log-polar grid (a per-pixel gather, ~1 ms on TPU
for even a 128x64 map), project |F| onto its ANGULAR and LOG-RADIAL
marginals with two STATIC binning matrices (dense MXU matmuls), then
correlate the two 1-D marginals: the angular marginal shifts circularly
by theta (scale-invariant), the log-radial marginal shifts by
log(s)/log(base) (rotation-invariant).

Run: JAX_PLATFORMS=cpu python tools/proto_projection_estimator.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from multi_frame_super_resolution_tpu.config import PREALIGN_FAST
from multi_frame_super_resolution_tpu.ops.fourier import (
    apodization_window,
    high_pass_filter,
)
from multi_frame_super_resolution_tpu.registration.logpolar import (
    _spectral_magnitude,
    log_polar_params,
    register_rotation_scale,
)


def projection_matrices(rows, cols, n_angle=None, radius_step=1.0,
                        r_weight="inv"):
    """Static (n_angle, rows*cols) and (n_rad, rows*cols) binning
    matrices over the fftshifted spectrum grid.

    Geometry matches log_polar_maps: isotropic frequency via
    px = (x - cols/2) * rows/cols, py = y - rows/2; angle in [0, pi)
    circular (spectrum point symmetry); log-radius in log_base units.
    """
    size, log_base = log_polar_params(rows, cols)
    n_angle = n_angle or size
    n_rad = int(np.ceil(size / radius_step))
    y, x = np.mgrid[0:rows, 0:cols].astype(np.float64)
    py = y - rows / 2.0
    px = (x - cols / 2.0) * (rows / float(cols))
    r = np.hypot(py, px)
    ang = np.arctan2(py, px) % np.pi  # [0, pi)
    valid = (r >= 1.0) & (r <= rows * 1.1 / 2.0)

    if r_weight == "inv":
        wgt = np.where(valid, 1.0 / np.maximum(r, 1.0), 0.0)
    elif r_weight == "inv2":
        wgt = np.where(valid, 1.0 / np.maximum(r, 1.0) ** 2, 0.0)
    else:
        wgt = valid.astype(np.float64)

    # angular bins: circular bilinear splat, bin step pi/n_angle
    ai = ang / (np.pi / n_angle)
    a0 = np.floor(ai).astype(np.int64)
    af = ai - a0
    A = np.zeros((n_angle, rows * cols), np.float64)
    flat = np.arange(rows * cols)
    A[a0.ravel() % n_angle, flat] += ((1.0 - af) * wgt).ravel()
    A[(a0.ravel() + 1) % n_angle, flat] += (af * wgt).ravel()

    # log-radius bins: bilinear splat, clamped
    with np.errstate(divide="ignore"):
        ri = np.log(np.maximum(r, 1e-9)) / np.log(log_base) / radius_step
    ri = np.clip(ri, 0.0, n_rad - 1.0)
    r0 = np.floor(ri).astype(np.int64)
    rf = ri - r0
    B = np.zeros((n_rad, rows * cols), np.float64)
    B[r0.ravel(), flat] += ((1.0 - rf) * wgt).ravel()
    B[np.minimum(r0.ravel() + 1, n_rad - 1), flat] += (rf * wgt).ravel()
    return A.astype(np.float32), B.astype(np.float32), log_base


def corr_peak_subpixel(a, b, circular, refine=32, phase=False):
    """1-D normalized cross-correlation peak of b against a (shift of b
    relative to a), with matrix-DFT subpixel refinement."""
    n = a.shape[-1]
    a = (a - a.mean()) / (a.std() + 1e-9)
    b = (b - b.mean()) / (b.std() + 1e-9)
    if circular:
        fa, fb = np.fft.rfft(a), np.fft.rfft(b)
        cps = np.conj(fa) * fb
        if phase:
            cps = cps / (np.abs(cps) + 1e-9)
        corr = np.fft.irfft(cps, n)
        shifts = np.arange(n)
        shifts = np.where(shifts > n // 2, shifts - n, shifts)
    else:
        m = 2 * n
        fa = np.fft.rfft(a, m)
        fb = np.fft.rfft(b, m)
        cps = np.conj(fa) * fb
        if phase:
            cps = cps / (np.abs(cps) + 1e-9)
        corr = np.fft.irfft(cps, m)
        shifts = np.arange(m)
        shifts = np.where(shifts >= n, shifts - m, shifts)
    k = int(np.argmax(corr))
    s0 = float(shifts[k])
    # local quadratic refine
    cm = corr[(k - 1) % len(corr)]
    cp = corr[(k + 1) % len(corr)]
    c0 = corr[k]
    denom = cm - 2 * c0 + cp
    frac = 0.5 * (cm - cp) / denom if abs(denom) > 1e-12 else 0.0
    return s0 + float(np.clip(frac, -0.5, 0.5))


def estimate_proj(m0, m1, A, B, log_base, radius_step, compress="log",
                  phase=True):
    m0 = np.asarray(m0, np.float64).ravel()
    m1 = np.asarray(m1, np.float64).ravel()
    if compress == "log":
        m0 = np.log1p(m0)
        m1 = np.log1p(m1)
    elif compress == "sqrt":
        m0 = np.sqrt(m0)
        m1 = np.sqrt(m1)
    h0a, h1a = A @ m0, A @ m1
    h0r, h1r = B @ m0, B @ m1
    n_angle = A.shape[0]
    da = corr_peak_subpixel(h0a, h1a, circular=True, phase=phase)
    dr = corr_peak_subpixel(h0r, h1r, circular=False, phase=phase)
    rot = -da * (np.pi / n_angle)
    scale = log_base ** (dr * radius_step)
    return rot, scale


def make_pair(rng, rows, cols, rot_deg, scale, shift):
    """Synthesize a (ref, moved) pair: moved = ref rotated by rot about
    center, scaled, shifted — via scipy-free bilinear sampling of a
    smooth random field."""
    big = rng.random((rows * 3, cols * 3))
    # smooth it
    for _ in range(2):
        big = 0.25 * (
            np.roll(big, 1, 0) + np.roll(big, -1, 0)
            + np.roll(big, 1, 1) + np.roll(big, -1, 1)
        )
    # also add structure at mid frequencies
    yy, xx = np.mgrid[0 : rows * 3, 0 : cols * 3]
    big = big + 0.3 * np.sin(yy * 0.4) * np.cos(xx * 0.23)

    def sample(theta, s, dy, dx):
        y, x = np.mgrid[0:rows, 0:cols].astype(np.float64)
        cy, cx = (rows - 1) / 2.0, (cols - 1) / 2.0
        yc, xc = y - cy - dy, x - cx - dx
        ca, sa = np.cos(theta), np.sin(theta)
        sy = (sa * xc + ca * yc) * s + cy + rows
        sx = (ca * xc - sa * yc) * s + cx + cols
        y0 = np.floor(sy).astype(int)
        x0 = np.floor(sx).astype(int)
        fy, fx = sy - y0, sx - x0
        g = (
            big[y0, x0] * (1 - fy) * (1 - fx)
            + big[y0 + 1, x0] * fy * (1 - fx)
            + big[y0, x0 + 1] * (1 - fy) * fx
            + big[y0 + 1, x0 + 1] * fy * fx
        )
        return g.astype(np.float32)

    return sample(0.0, 1.0, 0.0, 0.0), sample(
        np.deg2rad(rot_deg), 1.0 / scale, shift[0], shift[1]
    )


def main():
    rows, cols = 64, 128
    cfg = PREALIGN_FAST
    win = jnp.asarray(apodization_window(rows, cols, int(0.12 * rows)))
    hp = jnp.asarray(high_pass_filter(rows, cols))
    mag = jax.jit(lambda g: _spectral_magnitude(g, win, hp))

    cases = [
        (0.0, 1.0), (2.0, 1.0), (5.0, 1.0), (10.0, 1.0), (-15.0, 1.0),
        (5.0, 1.05), (0.0, 1.08), (-10.0, 0.95),
    ]
    for r_weight in ("none", "inv", "inv2"):
        for compress in ("none", "sqrt", "log"):
            for phase in (False, True):
                A, B, log_base = projection_matrices(
                    rows, cols, radius_step=1.0, r_weight=r_weight
                )
                rng = np.random.default_rng(0)
                errs_r, errs_s = [], []
                for rot_deg, scale in cases:
                    g0, g1 = make_pair(
                        rng, rows, cols, rot_deg, scale, (1.5, -2.0)
                    )
                    m0 = np.asarray(mag(jnp.asarray(g0)))
                    m1 = np.asarray(mag(jnp.asarray(g1)))
                    rot_p, scale_p = estimate_proj(
                        m0, m1, A, B, log_base, 1.0, compress, phase
                    )
                    errs_r.append(abs(-np.rad2deg(rot_p) - rot_deg))
                    errs_s.append(abs(scale_p - 1.0 / scale) * 100)
                print(
                    f"rw={r_weight:5s} cm={compress:5s} ph={int(phase)} | "
                    f"rot err max {max(errs_r):6.2f} deg mean "
                    f"{np.mean(errs_r):6.2f} | scale err max {max(errs_s):5.2f}%"
                )

    # reference column for the same cases
    rng = np.random.default_rng(0)
    errs_r, errs_s = [], []
    for rot_deg, scale in cases:
        g0, g1 = make_pair(rng, rows, cols, rot_deg, scale, (1.5, -2.0))
        rot_l, scale_l, _ = register_rotation_scale(
            jnp.asarray(g0), jnp.asarray(g1), cfg
        )
        errs_r.append(abs(-np.rad2deg(float(rot_l)) - rot_deg))
        errs_s.append(abs(float(scale_l) - 1.0 / scale) * 100)
    print(
        f"logpolar reference        | rot err max {max(errs_r):6.2f} deg "
        f"mean {np.mean(errs_r):6.2f} | scale err max {max(errs_s):5.2f}%"
    )


if __name__ == "__main__":
    main()

"""Fit the fixed post-merge restoration kernel (round 4).

The order-1 merge reconstructs the box-prefiltered HR field accurately
(~30 dB vs box2*HR) but cannot undo the sampling prefilter itself
(2x2 box + bilinear warp + merge kernel): PSNR(HR, box2*HR) = 31.0 dB is
the no-deconvolution ceiling. A per-frequency Wiener gain fit against
the known ground truth recovers +1.0 dB on the order-1 output (round-4
measurement). This script bakes that gain into a small FIR kernel:

  1. run the production fast RAW pipeline on the CALIBRATION burst
     (city, seed 7),
  2. compute the radially-binned Wiener gain g(w) = <HR.S*> / <|S|^2>,
  3. inverse-transform to a KxK spatial kernel (crop + DC renormalize),
  4. VALIDATE on held-out bursts: different seeds and different scenes
     (iso / car frames as HR) — the kernel ships only because the gain
     is dominated by the scene-independent sampling PSF, and this
     script proves the transfer.

Prints the kernel as Python source for ops/restore.py plus the
validation table. Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=/root/repo python tools/fit_restore.py [K]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval_fidelity import make_hr_burst  # noqa: E402


def radial_wiener_gain(sr, hr, nbins=24):
    """Radially-binned per-frequency linear restoration gain."""
    sh, sw = sr.shape[:2]
    yy = np.fft.fftfreq(sh)[:, None]
    xx = np.fft.rfftfreq(sw)[None, :]
    r = np.sqrt(yy ** 2 + xx ** 2)
    bins = np.minimum((r / r.max() * nbins).astype(int), nbins - 1)
    num = np.zeros(nbins)
    den = np.zeros(nbins)
    for c in range(sr.shape[2]):
        S = np.fft.rfft2(sr[..., c])
        Hh = np.fft.rfft2(hr[..., c])
        cross = np.real(Hh * np.conj(S))
        power = np.abs(S) ** 2
        for b in range(nbins):
            sel = bins == b
            num[b] += cross[sel].sum()
            den[b] += power[sel].sum()
    return num / np.maximum(den, 1e-12), bins, r


def gain_to_kernel(gain, bins, shape, ksize):
    """Radial gain -> centered KxK FIR kernel (irfft2, crop, renorm)."""
    g2 = gain[bins]
    k_full = np.fft.irfft2(g2, s=shape)
    k_full = np.fft.fftshift(k_full)
    cy, cx = shape[0] // 2, shape[1] // 2
    r = ksize // 2
    k = k_full[cy - r : cy + r + 1, cx - r : cx + r + 1].astype(np.float64)
    # enforce symmetry (the gain is real+radial; crop noise breaks it)
    k = (k + k[::-1] + k[:, ::-1] + k[::-1, ::-1]) / 4.0
    k /= k.sum()  # unit DC: flat fields pass through exactly
    return k.astype(np.float32)


def apply_kernel(img, k):
    from scipy.signal import convolve2d

    out = np.stack(
        [
            convolve2d(img[..., c], k, mode="same", boundary="symm")
            for c in range(img.shape[2])
        ],
        axis=-1,
    )
    return np.clip(out, 0.0, 1.0)


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw
    from multi_frame_super_resolution_tpu.utils import psnr

    import dataclasses

    ksize = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    # fit on the PRE-restore merge output (final_restore defaults on)
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    cfg = dataclasses.replace(cfg, final_restore=False)
    run = jax.jit(lambda b: handheld_superres_raw(b, cfg))

    m = 16

    def score(hr, img):
        return float(
            psnr(jnp.asarray(hr[m:-m, m:-m]), jnp.asarray(img[m:-m, m:-m]))
        )

    def make_case(hr, seed):
        hr = np.ascontiguousarray(hr)
        # even dims required by the RAW pipeline
        h, w = (hr.shape[0] // 16) * 16, (hr.shape[1] // 16) * 16
        hr = hr[:h, :w]
        raw, _ = make_hr_burst(hr, seed=seed)
        sr = np.asarray(run(jnp.asarray(raw)))
        return hr, sr

    city = np.asarray(load_burst("city")[0])
    iso = np.asarray(load_burst("iso")[0])
    car = np.asarray(load_burst("car")[0])

    # ---- calibrate on city seed 7 ----
    hr_c, sr_c = make_case(city, 7)
    gain, bins, _ = radial_wiener_gain(sr_c, hr_c)
    k = gain_to_kernel(gain, bins, sr_c.shape[:2], ksize)

    print("# restoration kernel (fit by tools/fit_restore.py)")
    print("RESTORE_KERNEL = np.array([")
    for row in k:
        print("    [" + ", ".join(f"{v:.6f}" for v in row) + "],")
    print("], dtype=np.float32)")
    print()

    # ---- validate ----
    cases = [
        ("city seed7 (calib)", hr_c, sr_c),
    ]
    for name, hr, seed in [
        ("city seed19", city, 19),
        ("iso seed3", iso, 3),
        ("car seed11", car, 11),
    ]:
        h, s = make_case(hr, seed)
        cases.append((name, h, s))
    for name, hr, sr in cases:
        before = score(hr, sr)
        after = score(hr, apply_kernel(sr, k))
        print(f"{name:24s} before {before:6.2f}  after {after:6.2f}  "
              f"delta {after - before:+.2f} dB")


if __name__ == "__main__":
    main()

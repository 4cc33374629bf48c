"""Profile the global pre-alignment sub-stages on TPU (amortized
protocol from BENCH_NOTES.md). Run with PYTHONPATH=/root/repo:/root/.axon_site."""

from __future__ import annotations

import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np  # noqa: E402

from profile_stages import amortized_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import PREALIGN_FAST
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models.fast_merge import raw_to_planes
    from multi_frame_super_resolution_tpu.models.handheld import (
        _subsample_from_planes,
    )
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.ops.fourier import (
        apodization_window,
        high_pass_filter,
    )
    from multi_frame_super_resolution_tpu.registration.logpolar import (
        _spectral_magnitude,
        register_rotation_scale,
        register_similarity,
        to_log_polar,
    )
    from multi_frame_super_resolution_tpu.registration.phase_correlation import (
        phase_correlate,
    )
    from multi_frame_super_resolution_tpu.registration.prealign import (
        _box_down,
        estimate_burst_similarity,
        prealign_planes,
    )

    cfg = PREALIGN_FAST
    burst = load_burst("city")
    raw = np.stack([mosaic_rggb(f) for f in burst])
    planes = raw_to_planes(jnp.asarray(raw))
    cfa = ((0, 1), (1, 2))
    half = _subsample_from_planes(planes, cfa)
    gray = rgb_to_gray(half)  # (5, 128, 256)
    small = _box_down(gray, 2)  # (5, 64, 128) — the estimation resolution
    f, hh, hw = small.shape

    win = jnp.asarray(apodization_window(hh, hw, int(0.12 * hh)))
    hp = jnp.asarray(high_pass_filter(hh, hw))
    mag = jax.jit(lambda g: _spectral_magnitude(g, win, hp))(small[0])
    lp0 = jax.jit(
        lambda m: to_log_polar(m, cfg.logpolar_interp, cfg.lp_radius_step)
    )(mag)

    t = amortized_ms(lambda x: _spectral_magnitude(x, win, hp), small[1])
    print(f"spectral magnitude (1 frame {hh}x{hw}): {t:.3f} ms")
    t = amortized_ms(
        lambda m: to_log_polar(m, cfg.logpolar_interp, cfg.lp_radius_step), mag
    )
    print(f"to_log_polar {cfg.logpolar_interp} ({lp0.shape}): {t:.3f} ms")
    t = amortized_ms(
        lambda l: phase_correlate(lp0, l, cfg.eps, True, refine=cfg.peak_upsample),
        lp0 * 0.99,
    )
    print(f"phase_correlate+dft16 ({lp0.shape}): {t:.3f} ms")
    t = amortized_ms(lambda g: register_rotation_scale(small[0], g, cfg), small[1])
    print(f"register_rotation_scale (1 frame): {t:.3f} ms")
    t = amortized_ms(lambda g: register_similarity(small[0], g, cfg), small[1])
    print(f"register_similarity (1 frame): {t:.3f} ms")
    t = amortized_ms(lambda g: estimate_burst_similarity(g, cfg), gray)
    print(f"estimate_burst_similarity (4 alts): {t:.3f} ms")
    t = amortized_ms(lambda p: prealign_planes(p, gray, cfg)[0], planes)
    print(f"prealign_planes total: {t:.3f} ms")


if __name__ == "__main__":
    main()

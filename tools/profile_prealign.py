"""Profile the global pre-alignment sub-stages on TPU (amortized
protocol from BENCH_NOTES.md). Run: python tools/profile_prealign.py"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo/tools")
from profile_stages import amortized_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import RegistrationConfig
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
        log_polar_params,
        register_rotation_scale,
        register_similarity,
        register_translation,
        to_log_polar,
    )
    from multi_frame_super_resolution_tpu.registration.phase_correlation import (
        phase_correlate,
    )
    from multi_frame_super_resolution_tpu.registration.prealign import (
        estimate_burst_similarity,
        prealign_planes,
    )

    burst = load_burst("city")
    raw = np.stack([mosaic_rggb(f) for f in burst])
    planes = raw_to_planes(jnp.asarray(raw))
    cfa = ((0, 1), (1, 2))
    half = _subsample_from_planes(planes, cfa)
    gray = rgb_to_gray(half)  # (5, 128, 256)
    f, hh, hw = gray.shape
    cfg = RegistrationConfig()

    win = jnp.asarray(apodization_window(hh, hw, int(0.12 * hh)))
    hp = jnp.asarray(high_pass_filter(hh, hw))
    mag = jax.jit(lambda g: _spectral_magnitude(g, win, hp))(gray[0])
    lp0 = jax.jit(to_log_polar)(mag)

    print(f"log-polar size: {log_polar_params(hh, hw)[0]}")
    t = amortized_ms(lambda x: _spectral_magnitude(x, win, hp), gray[1])
    print(f"spectral magnitude (1 frame): {t:.2f} ms")
    t = amortized_ms(to_log_polar, mag)
    print(f"to_log_polar bicubic (1 img): {t:.2f} ms")
    t = amortized_ms(lambda m: to_log_polar(m, "bilinear"), mag)
    print(f"to_log_polar bilinear (1 img): {t:.2f} ms")
    t = amortized_ms(lambda l: phase_correlate(lp0, l, cfg.eps, True), lp0 * 0.99)
    print(f"phase_correlate logpolar ({lp0.shape}): {t:.2f} ms")
    t = amortized_ms(
        lambda g: register_rotation_scale(gray[0], g, cfg), gray[1]
    )
    print(f"register_rotation_scale (1 frame): {t:.2f} ms")
    t = amortized_ms(lambda g: register_similarity(gray[0], g, cfg), gray[1])
    print(f"register_similarity (1 frame): {t:.2f} ms")
    t = amortized_ms(lambda g: estimate_burst_similarity(g, cfg), gray)
    print(f"estimate_burst_similarity (4 alts): {t:.2f} ms")
    t = amortized_ms(lambda p: prealign_planes(p, gray, cfg)[0], planes)
    print(f"prealign_planes total: {t:.2f} ms")


if __name__ == "__main__":
    main()

"""Compare the Pallas merge kernel vs the XLA static-tap merge on TPU:
numeric parity + amortized timing. Run: python tools/bench_merge_pallas.py"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.models.fast_merge import merge_burst_fast
    from multi_frame_super_resolution_tpu.pallas_ops.merge import merge_fast_pallas
    from tools.profile_stages import amortized_ms

    rng = np.random.default_rng(0)
    f, h, w = 5, 256, 512
    # omega must be a valid inverse covariance (PSD: oxy^2 < oxx*oyy) —
    # an indefinite quadratic makes exp() blow up to ~1e8 and turns ULP
    # noise into scary-looking absolute diffs
    oxx = 0.5 + rng.random((h, w)).astype(np.float32)
    oyy = 0.5 + rng.random((h, w)).astype(np.float32)
    oxy = (0.8 * np.sqrt(oxx * oyy) * (rng.random((h, w)) - 0.5) * 2.0).astype(
        np.float32
    )
    x = dict(
        warped=jnp.asarray(rng.random((f, h, w, 3)), jnp.float32),
        residual=jnp.asarray(rng.random((f, h, w, 2)) - 0.5, jnp.float32),
        certainty=jnp.asarray(rng.random((f, h, w, 3)), jnp.float32),
        omega=jnp.asarray(np.stack([oxx, oyy, oxy], -1)),
    )

    def xla(v):
        return merge_burst_fast(
            v["warped"], v["residual"], v["certainty"], v["omega"], 2
        )

    def pallas(v):
        return merge_fast_pallas(
            v["warped"], v["residual"], v["certainty"], v["omega"], 2
        )

    nx, dx = jax.jit(xla)(x)
    np_, dp = jax.jit(pallas)(x)
    err_n = float(jnp.max(jnp.abs(nx - np_)))
    err_d = float(jnp.max(jnp.abs(dx - dp)))
    print(f"parity: max|num diff|={err_n:.3e} max|den diff|={err_d:.3e}")

    ms_x = amortized_ms(xla, x)
    ms_p = amortized_ms(pallas, x)
    print(f"xla merge    {ms_x:8.3f} ms")
    print(f"pallas merge {ms_p:8.3f} ms   speedup {ms_x / ms_p:.2f}x")


if __name__ == "__main__":
    main()

"""Round-5 RGB prealign decomposition: estimation vs application.

Variants (city RGB burst, amortized in-graph protocol):
  full        estimate + apply (the pipeline's prealign stage)
  apply-only  apply a precomputed transform stack (prealign_override)
  est-only    estimate, return the transform params (no warp)

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_prealign_split_r5.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def amortized_ms(fn, args, k=16, reps=3):
    import jax
    import jax.numpy as jnp

    def make(length):
        @jax.jit
        def rep(a):
            def body(c, _):
                out = fn(*jax.tree.map(lambda x: x * (1.0 + c * 1e-5), a))
                out = jax.lax.optimization_barrier(out)
                return c + 1.0, sum(
                    jnp.sum(o) for o in jax.tree.leaves(out)
                )

            _, outs = jax.lax.scan(body, 0.0, None, length=length)
            return jnp.sum(outs)

        return rep

    r1, rk = make(1), make(k)
    variants = [
        jax.tree.map(lambda x: x * (1.0 - 1e-4 * i), args)
        for i in range(2 * reps + 2)
    ]
    for v in variants:
        jax.block_until_ready(v)
    float(r1(variants[0]))
    float(rk(variants[1]))
    t1s, tks = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        float(r1(variants[2 + 2 * i]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(rk(variants[3 + 2 * i]))
        tks.append(time.perf_counter() - t0)
    return max(float(np.median(tks)) - float(np.median(t1s)), 1e-9) / (k - 1) * 1e3


def main():
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.ops.color import rgb_to_gray
    from multi_frame_super_resolution_tpu.registration.prealign import (
        apply_burst_similarity,
        estimate_burst_similarity,
        prealign_burst,
    )

    cfg = HandheldConfig().prealign_cfg
    burst = jnp.asarray(np.stack([np.asarray(f) for f in load_burst("city")]))
    gray = rgb_to_gray(burst)
    st = estimate_burst_similarity(gray, cfg)

    results = {}
    for rep in range(int(os.environ.get("MFSR_BENCH_ROUNDS", "2"))):
        for name, (fn, args) in {
            "full": (lambda b: prealign_burst(b, rgb_to_gray(b), cfg), (burst,)),
            "apply-only": (
                lambda b, s=st: apply_burst_similarity(b, s, cfg), (burst,)
            ),
            "est-only": (
                lambda g: estimate_burst_similarity(g, cfg), (gray,)
            ),
        }.items():
            ms = amortized_ms(fn, args)
            results.setdefault(name, []).append(ms)
            print(f"[rep {rep}] {name:10s} {ms:6.3f} ms", flush=True)
    print("--- medians ---")
    for name, vals in results.items():
        print(f"{name:10s} {float(np.median(vals)):6.3f} ms")


if __name__ == "__main__":
    main()

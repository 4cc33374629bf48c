"""In-context A/B of the final phase interleave, with and without
output materialization forced by lax.optimization_barrier.

The amortized scan protocol reduces the pipeline output to a scalar, so
XLA can fold sum(reshape(transpose(x))) into sum(x) and skip the
interleave; a barrier before the sum forces the output tensor to exist.

Measurement: all variants are compiled and warmed FIRST, then the timed
reps are INTERLEAVED round-robin across variants — sequential
per-variant timing confounds the comparison with tunnel/device drift
(observed: the same executable drifting 0.4 -> 1.7 ms over a few
minutes of wall clock).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_interleave_ctx.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    import multi_frame_super_resolution_tpu.ops.warp_fast as wf
    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw

    burst = load_burst("city")
    raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )

    orig_plain = wf.interleave_phases_planes
    orig_mxu = wf.interleave_phases_planes_mxu

    K, REPS = 16, 6

    def make(fn, length, barrier):
        @jax.jit
        def rep(v):
            def body(c, _):
                out = fn(jax.tree.map(lambda a: a * (1.0 + c * 1e-5), v))
                if barrier:
                    out = jax.lax.optimization_barrier(out)
                return c + 1.0, jnp.sum(out)

            _, outs = jax.lax.scan(body, 0.0, None, length=length)
            return jnp.sum(outs)

        return rep

    # (tag, barrier, interleave impl)
    cases = [
        ("transpose, no barrier (= bench.py)", False, orig_plain),
        ("mxu high, no barrier", False, lambda p: orig_mxu(p, precision="high")),
        ("transpose, barrier", True, orig_plain),
        ("mxu high, barrier", True, lambda p: orig_mxu(p, precision="high")),
        ("mxu highest, barrier", True, lambda p: orig_mxu(p, precision="highest")),
    ]

    progs = []
    for tag, barrier, interleave in cases:
        wf.interleave_phases_planes_mxu = lambda p, precision=None: interleave(p)
        try:
            pipe = lambda b: handheld_superres_raw(b, cfg)  # noqa: E731
            progs.append((tag, make(pipe, 1, barrier), make(pipe, K, barrier)))
        finally:
            wf.interleave_phases_planes_mxu = orig_mxu

    # distinct inputs per (variant, rep, length) — the backend caches
    # repeated identical (executable, input) calls
    n_inputs = len(cases) * (2 * REPS + 2)
    variants = [raw * (1.0 - 1e-4 * i) for i in range(n_inputs)]
    for v in variants:
        jax.block_until_ready(v)

    # compile + warm every program before ANY timing
    vi = iter(variants)
    for tag, r1, rk in progs:
        float(r1(next(vi)))
        float(rk(next(vi)))
        print(f"compiled: {tag}", flush=True)

    t1 = {tag: [] for tag, _, _ in progs}
    tk = {tag: [] for tag, _, _ in progs}
    for _ in range(REPS):
        for tag, r1, rk in progs:
            t0 = time.perf_counter()
            float(r1(next(vi)))
            t1[tag].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(rk(next(vi)))
            tk[tag].append(time.perf_counter() - t0)

    for tag, _, _ in progs:
        ms = (
            max(float(np.median(tk[tag])) - float(np.median(t1[tag])), 1e-9)
            / (K - 1)
            * 1e3
        )
        lo = (min(tk[tag]) - max(t1[tag])) / (K - 1) * 1e3
        hi = (max(tk[tag]) - min(t1[tag])) / (K - 1) * 1e3
        print(f"{tag:36s} {ms:7.3f} ms   [{lo:6.3f}, {hi:6.3f}]", flush=True)


if __name__ == "__main__":
    main()

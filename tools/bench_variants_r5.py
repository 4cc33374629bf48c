"""Round-5 variant differencing for the RAW fast pipeline on TPU.

Same protocol as bench_variants_r3.py (interleaved in ONE process,
amortized in-graph repetition) with two upgrades:
  * the scan body materializes the pipeline output through an
    optimization barrier, like bench.py — without it XLA elides the
    final interleave (~0.5 ms of real cost) from the measurement;
  * variants are given as eval_fidelity-style key=val token lists on
    the command line, so new MergeConfig knobs need no tool edits.

Usage:
  python tools/bench_variants_r5.py                     # default set
  python tools/bench_variants_r5.py base centroid_block=true ...
    (each ARG is one comma-joined variant: "centroid_block=true,plugin_iters=1")
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def amortized_ms_barrier(fn, x, k=8, reps=3):
    """Median amortized ms of fn(x): K-rep scan minus 1-rep scan, with
    the output materialized through an optimization barrier."""
    import jax
    import jax.numpy as jnp

    def make(length):
        @jax.jit
        def rep(v):
            def body(c, _):
                out = fn(jax.tree.map(lambda a: a * (1.0 + c * 1e-5), v))
                out = jax.lax.optimization_barrier(out)
                return c + 1.0, jnp.sum(jax.tree.leaves(out)[0])

            _, outs = jax.lax.scan(body, 0.0, None, length=length)
            return jnp.sum(outs)

        return rep

    r1, rk = make(1), make(k)
    variants = [
        jax.tree.map(lambda a: a * (1.0 - 1e-4 * i), x)
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


DEFAULT_VARIANTS = [
    "base",
    "centroid_block=true",
    "centroid_block=true,plugin_iters=1",
    "final_restore=false",
    "prealign=false",
    "order=0,final_restore=false",
]


def main():
    import jax
    import jax.numpy as jnp

    from eval_fidelity import parse_variant

    from multi_frame_super_resolution_tpu.config import (
        AlignConfig,
        HandheldConfig,
    )
    from multi_frame_super_resolution_tpu.data import load_burst, mosaic_rggb
    from multi_frame_super_resolution_tpu.models import (
        handheld_superres,
        handheld_superres_raw,
    )

    burst = load_burst("city")
    rgb_pipe = os.environ.get("MFSR_BENCH_PIPE", "raw") == "rgb"
    if rgb_pipe:
        raw = jnp.asarray(np.stack([np.asarray(f) for f in burst]))
        pipe = handheld_superres
    else:
        raw = jnp.asarray(np.stack([mosaic_rggb(f) for f in burst]))
        pipe = handheld_superres_raw

    base = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )

    tokens_list = sys.argv[1:] or DEFAULT_VARIANTS
    k = int(os.environ.get("MFSR_BENCH_K", "8"))
    reps = int(os.environ.get("MFSR_BENCH_REPS", "3"))
    rounds = int(os.environ.get("MFSR_BENCH_ROUNDS", "2"))

    variants = {}
    for spec in tokens_list:
        toks = [] if spec == "base" else spec.split(",")
        name, cfg, _ = parse_variant(toks, base)
        variants[name if toks else "base"] = cfg

    results = {}
    for rep in range(rounds):
        for name, cfg in variants.items():
            fn = lambda b, c=cfg: pipe(b, c)  # noqa: E731
            ms = amortized_ms_barrier(fn, raw, k=k, reps=reps)
            results.setdefault(name, []).append(ms)
            print(f"[rep {rep}] {name:44s} {ms:6.3f} ms", flush=True)
    print("--- medians ---")
    for name, vals in results.items():
        mp = 0.524288 / (float(np.median(vals)) / 1e3)
        print(f"{name:44s} {float(np.median(vals)):6.3f} ms  ({mp:5.0f} MP/s)")


if __name__ == "__main__":
    main()

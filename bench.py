"""Headline benchmark: end-to-end 5-frame align+fuse 2x super-resolution
throughput on one chip (BASELINE.json metric: MP/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 500 (the driver-supplied north-star 500 MP/s/chip).

Measurement: amortized in-graph repetition — see BENCH_NOTES.md for why
(the remote TPU backend caches repeated identical calls and
block_until_ready can return early, so naive loops are dishonest).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import AlignConfig, HandheldConfig

    # city-burst geometry (5 x 256 x 512 x 3); use the real burst when the
    # reference data is mounted, synthetic otherwise
    try:
        from multi_frame_super_resolution_tpu.data import load_burst

        burst_np = load_burst("city")
    except Exception:
        from multi_frame_super_resolution_tpu.data import synthetic_burst

        g, _ = synthetic_burst(
            np.random.default_rng(0), num_frames=5, height=256, width=512, max_shift=3.0
        )
        burst_np = np.stack([g] * 3, axis=-1)

    # headline = the north-star pipeline: demosaic + align + robust fuse +
    # 2x SR on the mosaicked city burst (BASELINE.json configs[4])
    from multi_frame_super_resolution_tpu.data import mosaic_rggb
    from multi_frame_super_resolution_tpu.models import handheld_superres_raw

    raw_np = np.stack([mosaic_rggb(f) for f in burst_np])
    cfg = HandheldConfig(
        align=AlignConfig(tile_size=16, search_radius=4, levels=2), gamma=False
    )
    pipeline = lambda b: handheld_superres_raw(b, cfg)  # noqa: E731
    burst_np = raw_np

    # k-rep in-graph scan: the tunnel adds ~±4 ms of PER-CALL jitter, so
    # the scan must hold enough bursts that the per-burst signal
    # dominates it — k=64 puts ~80 ms of real work behind one dispatch
    # and shrinks the per-burst band to ~±2% (round 4: k=6 spread
    # 0.2-1.5 ms/burst across reps, k=24 ±0.17, k=64 1.21-1.255)
    k = int(os.environ.get("MFSR_BENCH_K", "64"))
    reps = int(os.environ.get("MFSR_BENCH_REPS", "4"))

    def make_rep(length):
        @jax.jit
        def rep(x):
            def body(c, _):
                out = pipeline(x * (1.0 + c * 1e-5))
                # materialize the output tensor: without the barrier XLA
                # folds sum(clip(interleave(x))) into a reduction over the
                # phase planes and ELIDES the final interleave (~0.5 ms of
                # real per-burst cost at city size) — the headline must
                # price the full pipeline including its output layout
                out = jax.lax.optimization_barrier(out)
                return c + 1.0, jnp.sum(out)
            _, outs = jax.lax.scan(body, 0.0, None, length=length)
            return jnp.sum(outs)
        return rep

    r1 = make_rep(1)
    rk = make_rep(k)
    variants = [jnp.asarray(burst_np * (1.0 - 1e-4 * i)) for i in range(2 * reps + 2)]
    for v in variants:
        float(jnp.sum(v))
    float(r1(variants[0]))  # compile + warm
    float(rk(variants[1]))

    t1s, tks = [], []
    for i in range(reps):
        t0 = time.perf_counter()
        float(r1(variants[2 + 2 * i]))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(rk(variants[3 + 2 * i]))
        tks.append(time.perf_counter() - t0)
    t1 = float(np.median(t1s))
    tk = float(np.median(tks))
    per_burst = max(tk - t1, 1e-9) / (k - 1)

    out_h = burst_np.shape[1] * cfg.scale
    out_w = burst_np.shape[2] * cfg.scale
    mp = out_h * out_w / 1e6
    value = mp / per_burst

    # variance protocol (VERDICT r3 weak #5): per-rep paired estimates
    # (t_k[i] - t_1[i]) / (k - 1) expose the tunnel noise band so a true
    # regression is distinguishable from measurement scatter
    per_rep_ms = [
        max(tks[i] - t1s[i], 1e-9) / (k - 1) * 1000.0 for i in range(reps)
    ]
    print(
        json.dumps(
            {
                "metric": "handheld_burst_sr_2x_throughput",
                "value": round(value, 2),
                "unit": "MP/s/chip (output megapixels)",
                "vs_baseline": round(value / 500.0, 4),
                "p50_burst_latency_ms": round(per_burst * 1000.0, 2),
                "reps": reps,
                "scan_len": k,
                "per_rep_latency_ms": [round(x, 3) for x in per_rep_ms],
                "latency_band_ms": [
                    round(min(per_rep_ms), 3),
                    round(max(per_rep_ms), 3),
                ],
            }
        )
    )


if __name__ == "__main__":
    main()

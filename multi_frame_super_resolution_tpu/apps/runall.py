"""Full benchmark matrix — the runall.sh equivalent
(finalProject/Project/runall.sh:1-15): 4 optical flows x 3 datasets of
BTV-L1 SR at iterations=10, plus the defog configurations, printing one
summary line per configuration.
"""

from __future__ import annotations

import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    quick = "--quick" in argv

    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.config import BTVConfig, PolarDefogConfig
    from multi_frame_super_resolution_tpu.data import load_burst
    from multi_frame_super_resolution_tpu.models import btvl1_superres, polar_defog
    from multi_frame_super_resolution_tpu.apps.polar_defog import _load_inputs

    flows = ["farneback", "tvl1", "pyrlk", "brox"]
    datasets = ["city", "car", "iso"]
    if quick:
        flows = flows[:1]
        datasets = datasets[:1]

    # defog configs (runall.sh:1-3 uses the TIFF inputs; here the
    # synthetic input type keeps the matrix self-contained)
    iper, ipar = _load_inputs(3)
    for beta in ([1.55] if quick else [1.55, 10.0]):
        cfg = PolarDefogConfig(beta=beta)
        # the perturbation scale is a traced argument (one executable) and
        # defeats remote result caching of identical calls; the jnp.sum
        # readback is the reliable completion fence on remote backends
        fn = jax.jit(
            lambda a, b, s: jnp.sum(polar_defog(a * s, b, cfg))
        )
        iper_j = jnp.asarray(iper)
        ipar_j = jnp.asarray(ipar)
        float(fn(iper_j, ipar_j, jnp.float32(1.0)))  # compile+warm
        iters = 8 if quick else 64
        t0 = time.perf_counter()
        for i in range(iters):
            float(fn(iper_j, ipar_j, jnp.float32(1.0 + i * 1e-6)))
        dt = time.perf_counter() - t0
        print(
            f"polar_defog beta={beta}: {dt:.3f} sec, {iters / dt:.2f} FPS "
            f"(per-frame dispatch)"
        )

        # also report the marginal in-graph throughput (labeled; the
        # deployment-style number — see apps/polar_defog.py)
        def scan_run(n):
            @jax.jit
            def run(a, b):
                def body(c, _):
                    out = polar_defog(a * (1.0 + c * 1e-7), b, cfg)
                    return c + 1.0, jnp.sum(out)

                _, outs = jax.lax.scan(body, 0.0, None, length=n)
                return jnp.sum(outs)

            return run

        r1, rn = scan_run(1), scan_run(iters)
        float(r1(iper_j, ipar_j))
        float(rn(iper_j * 0.999, ipar_j))
        t0 = time.perf_counter()
        float(r1(iper_j * 0.998, ipar_j))
        t1 = time.perf_counter()
        float(rn(iper_j * 0.997, ipar_j))
        dscan = (time.perf_counter() - t1) - (t1 - t0)
        if dscan > 0:
            print(
                f"polar_defog beta={beta}: {dscan:.3f} sec, "
                f"{(iters - 1) / dscan:.2f} FPS (marginal, in-graph scan)"
            )

    for ds in datasets:
        burst = jnp.asarray(load_burst(ds))
        f = burst.shape[0]
        for flow in flows:
            cfg = BTVConfig(scale=2, iterations=10, optical_flow=flow)
            sr = jax.jit(
                lambda b, s: jnp.sum(btvl1_superres(b * s, 0, cfg))
            )
            float(sr(burst, jnp.float32(1.0)))  # warmup/compile
            n = 2 if quick else f
            t0 = time.perf_counter()
            for i in range(n):
                float(sr(burst, jnp.float32(1.0 + i * 1e-6)))
            dt = time.perf_counter() - t0
            print(f"multi_frame_sr {flow} {ds} 10: {dt:.3f} sec, {n / dt:.2f} FPS")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Polarization-defog CLI.

Mirrors the reference app's surface and protocol
(polar_defog.cpp:64-303):

    mfsr-polar-defog debug inputType beta

  * debug: 0 | 1 (1 => single frame, dump intermediates)
  * inputType: 1 => 16-bit TIFF pair ImageWorst_tiff16.tiff /
    ImageBest_tiff16.tiff; 2 => degree0/45/90.tiff Stokes synthesis;
    3 => synthetic fog (self-contained demo; not in the reference)
  * beta: polarization scale (1.55 for type 1, 10 for type 2)

Runs 32 warmup + 256 timed frames fully on device (airlight top-k
included — no CPU sort round trip), prints seconds and FPS for BOTH
protocols — the reference's per-frame-dispatch wall clock (the headline;
includes any per-call RPC floor of a remote backend) and, labeled, the
marginal in-graph-scan device throughput — then writes R_gpu.png.
"""

from __future__ import annotations

import sys
import time


def _load_inputs(input_type: int):
    import numpy as np  # used by every branch

    from multi_frame_super_resolution_tpu.data import imread_u16

    if input_type == 1:
        iper = imread_u16("ImageWorst_tiff16.tiff")
        ipar = imread_u16("ImageBest_tiff16.tiff")
        if iper.ndim == 2:
            iper = np.repeat(iper[..., None], 3, -1)
            ipar = np.repeat(ipar[..., None], 3, -1)
        return iper, ipar
    if input_type == 2:
        import jax.numpy as jnp

        from multi_frame_super_resolution_tpu.models import stokes_synthesis  # noqa: PLC0415

        i0 = imread_u16("degree0.tiff")
        i45 = imread_u16("degree45.tiff")
        i90 = imread_u16("degree90.tiff")
        iper, ipar = stokes_synthesis(
            jnp.asarray(i0), jnp.asarray(i45), jnp.asarray(i90)
        )
        return np.asarray(iper), np.asarray(ipar)
    if input_type == 3:
        rng = np.random.default_rng(0)
        base = rng.random((300, 400, 3)).astype(np.float32) * 0.5
        haze = np.linspace(0.2, 0.7, 300, dtype=np.float32)[:, None, None]
        iper = np.clip(base * 0.5 + haze * 0.8, 0, 1)
        ipar = np.clip(base * 0.5 + haze * 0.3, 0, 1)
        return iper, ipar
    raise ValueError("inputType must be 1, 2 or 3")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 3:
        print("mfsr-polar-defog debug inputType beta")
        print("\tdebug: 0 or 1")
        print("\tinputType: 1, 2 or 3 (3: synthetic demo)")
        print("\tbeta: 1.55 for 1 and 10 for 2, need to adjust")
        return -1
    debug = bool(int(argv[0]))
    input_type = int(argv[1])
    beta = float(argv[2])

    import jax
    import jax.numpy as jnp
    import numpy as np

    from multi_frame_super_resolution_tpu.config import PolarDefogConfig
    from multi_frame_super_resolution_tpu.data import imwrite
    from multi_frame_super_resolution_tpu.models import polar_defog

    iper_np, ipar_np = _load_inputs(input_type)
    cfg = PolarDefogConfig(beta=beta)
    # the scale argument varies per frame: it defeats remote result
    # caching of identical calls, and the scalar readback below is the
    # reliable completion fence (see BENCH_NOTES.md)
    fn = jax.jit(
        lambda a, b, s: polar_defog(a * s, b, cfg, return_intermediates=True)
    )

    warmup = 0 if debug else 32
    real_num = 1 if debug else 256

    iper = jnp.asarray(iper_np)
    ipar = jnp.asarray(ipar_np)

    if not debug:
        # HEADLINE: the reference protocol — 32 warmup + 256 individually
        # dispatched timed frames (polar_defog.cpp:126-141,298-300). On a
        # remote/tunnel backend each dispatch pays the RPC floor (~30 ms
        # here), which is part of what this protocol measures.
        for i in range(warmup):
            r, a, t = fn(iper, ipar, jnp.float32(1.0 - 1e-7 * i))
            float(jnp.sum(r))
        t0 = time.perf_counter()
        for i in range(real_num):
            r, a, t = fn(iper, ipar, jnp.float32(1.0 + 1e-7 * i))
            float(jnp.sum(r))
        elapsed = time.perf_counter() - t0
        print(f"{elapsed} sec ({real_num} frames, per-frame dispatch — reference protocol)")
        print(f"{real_num / elapsed} FPS")

        # SECONDARY (labeled, always reported): marginal device-side
        # throughput — the 256 frames as ONE lax.scan program, dispatch
        # floor cancelled by subtracting a 1-frame run. This is the
        # number a batched/pipelined deployment sees, NOT the reference
        # protocol. The per-iteration scale perturbation keeps iterations
        # from collapsing into one.
        def scan_fps(n):
            @jax.jit
            def run(a, b):
                def body(c, _):
                    r, _, _ = polar_defog(
                        a * (1.0 + c * 1e-7), b, cfg, return_intermediates=True
                    )
                    return c + 1.0, jnp.sum(r)

                _, outs = jax.lax.scan(body, 0.0, None, length=n)
                return jnp.sum(outs)

            return run

        r1, rn = scan_fps(1), scan_fps(real_num)
        float(r1(iper, ipar))
        float(rn(iper * 0.999, ipar))
        t0 = time.perf_counter()
        float(r1(iper * 0.998, ipar))
        t1 = time.perf_counter()
        float(rn(iper * 0.997, ipar))
        # the subtraction cancels the dispatch floor AND one frame of
        # compute, so the margin covers real_num - 1 frames
        scan_elapsed = (time.perf_counter() - t1) - (t1 - t0)
        if scan_elapsed <= 0:
            print("in-graph scan margin not measurable (tunnel jitter)")
        else:
            print(
                f"{scan_elapsed} sec ({real_num - 1} marginal frames, "
                f"in-graph scan — device-side throughput, not the "
                f"reference protocol)"
            )
            print(f"{(real_num - 1) / scan_elapsed} FPS (marginal, in-graph)")
    else:
        r, a, t = fn(iper, ipar, jnp.float32(1.0))

    out = np.asarray(r)
    imwrite("R_gpu.png", out)
    if debug:
        np.savez("polar_defog_debug.npz", A=np.asarray(a), t=np.asarray(t), R=out)
        print("A minmax:", float(jnp.min(a)), float(jnp.max(a)))
        print("t minmax:", float(jnp.min(t)), float(jnp.max(t)))
        print("R minmax:", float(jnp.min(r)), float(jnp.max(r)))
    return 0


if __name__ == "__main__":
    import numpy as np  # noqa: F401

    sys.exit(main())

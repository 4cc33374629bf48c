"""Round-5 prototype: cheaper centroid-moment structures for the plugin
order-1 RAW merge.

Observation driving this: the plugin solver's m00/m01/m02 are WEIGHT
moments — they never read the image values. The current implementation
accumulates them inside the same tap loop as (m00, b0), which forces the
per-tap weight tensor wc to feed 4+ reduce consumers; measured cost of
the order-1 extras is ~0.34 ms/burst at city size (k=64 variant
differencing, round 5) regardless of which in-loop algebra variant is
used (exact rho-fold / block-center / shared-res all within noise). This
prototypes SEPARATE centroid passes:

  o0          order-0 merge (num, den)                     [floor]
  o1          current order-1 plugin merge (slots=4)       [to beat]
  cent        centroid-only pass, block-center form, full res
  cent_ns     centroid-only, certainty UNSHIFTED per tap (the centroid
              is a weight ratio; smooth cert variation cancels)
  cent_pool   centroid-only on 2x2-pooled res/cert/omega fields at
              half the half-res grid (output upsampled bilinearly)
  o0+cent*    one jit of the candidate replacement for o1

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_centroid_r5.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def amortized_ms(fn, args, k=48, reps=3):
    import jax
    import jax.numpy as jnp

    def make(length):
        @jax.jit
        def rep(a):
            def body(c, _):
                out = fn(*jax.tree.map(lambda x: x * (1.0 + c * 1e-5), a))
                out = jax.lax.optimization_barrier(out)
                return c + 1.0, sum(jnp.sum(o) for o in jax.tree.leaves(out))

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


def centroid_planes(res_y, res_x, cert, om_g, om_rb, pat, s, taps, phi,
                    cert_shift=True):
    """Centroid-only weight moments (m00c, m01, m02) per phase, stacked
    (2s, 2s, 3, hh, hw) like _merge_planes_order1's outputs. Block-center
    form (weights AND centroid at the block-center residual; per-phase
    phi offsets fold exactly as scalars)."""
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.models.fast_merge import (
        _shift_last2,
    )

    f, hh, hw = res_y.shape[0], res_y.shape[-2], res_y.shape[-1]
    nph = s * s
    phi_y = np.repeat(phi, s)
    phi_x = np.tile(phi, s)
    phiy_b = jnp.asarray(phi_y * s, jnp.float32).reshape(nph, 1, 1, 1)
    phix_b = jnp.asarray(phi_x * s, jnp.float32).reshape(nph, 1, 1, 1)
    phiy_r = jnp.asarray(phi_y, jnp.float32).reshape(nph, 1, 1)
    phix_r = jnp.asarray(phi_x, jnp.float32).reshape(nph, 1, 1)
    sf = float(s)

    def quadp(dx, dy, om):
        return jnp.exp(
            -0.5 * (dx * dx * om[..., 0] + dy * dy * om[..., 1]
                    + 2.0 * dx * dy * om[..., 2])
        )

    cells = [[[[None] * 3 for _ in range(3)] for _ in range(2)]
             for _ in range(2)]
    for ky, kx in taps:
        u = (ky - res_y) * s
        v = (kx - res_x) * s
        dy_w = u[None] - phiy_b
        dx_w = v[None] - phix_b
        w_g = quadp(dx_w, dy_w, om_g)
        w_rb = quadp(dx_w, dy_w, om_rb)
        for a in (0, 1):
            qa, da = (a + ky) % 2, (a + ky) // 2
            for b in (0, 1):
                qb, db = (b + kx) % 2, (b + kx) // 2
                ch = int(pat[qa][qb])
                w = w_g if ch == 1 else w_rb
                cs = (
                    _shift_last2(cert[..., ch], da, db)
                    if cert_shift
                    else cert[..., ch]
                )
                wc = w * cs[None]
                red_wc = wc.sum(1, dtype=jnp.float32)
                red_ry = (res_y * wc).sum(1, dtype=jnp.float32)
                red_rx = (res_x * wc).sum(1, dtype=jnp.float32)
                terms = (
                    (0, red_wc),
                    (1, sf * ((float(ky) - phiy_r) * red_wc - red_ry)),
                    (2, sf * ((float(kx) - phix_r) * red_wc - red_rx)),
                )
                cell = cells[a][b][ch]
                for i, red in terms:
                    cell[i] = red if cell[i] is None else cell[i] + red

    zero = jnp.zeros((hh, hw), jnp.float32)

    def stack_m(k):
        rows = []
        for a in (0, 1):
            for py in range(s):
                cols = []
                for b in (0, 1):
                    for px in range(s):
                        ph = py * s + px
                        cols.append(jnp.stack(
                            [cells[a][b][c][k][ph]
                             if cells[a][b][c][k] is not None else zero
                             for c in range(3)], 0))
                rows.append(jnp.stack(cols, 0))
        return jnp.stack(rows, 0)

    return stack_m(0), stack_m(1), stack_m(2)


def pool2(x):
    """2x2 mean pool of the last two axes (trailing odd row/col dropped)."""
    h, w = x.shape[-2] // 2 * 2, x.shape[-1] // 2 * 2
    xs = x[..., :h, :w]
    sh = xs.shape[:-2] + (h // 2, 2, w // 2, 2)
    return xs.reshape(sh).mean((-3, -1))


def main():
    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.models.fast_merge import (
        _active_taps,
        _output_phase_offsets,
        merge_burst_raw_planes,
    )

    f, hh, hw, s = 5, 128, 256, 2
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.random((f, 2, 2, hh, hw)), jnp.float32)
    res = jnp.asarray(rng.random((f, hh, hw, 2)) - 0.5, jnp.float32)
    cert = jnp.asarray(rng.random((f, hh, hw, 3)), jnp.float32)
    om = jnp.asarray(
        np.stack([np.full((hh, hw), 1.2), np.full((hh, hw), 1.2),
                  np.zeros((hh, hw))], -1), jnp.float32)
    om_rb = om * 0.8
    pat = np.array([[0, 1], [1, 2]])
    taps = _active_taps(3, 1.0, s, 1.0, 1.5)
    phi = _output_phase_offsets(s)
    print(f"taps: {len(taps)}")

    def o0(planes, res, cert, om, om_rb):
        return merge_burst_raw_planes(
            planes, res, cert, om, om_rb, pat, s, radius=2,
            phase_output=True, prune_exp=1.5)

    def o1(planes, res, cert, om, om_rb):
        return merge_burst_raw_planes(
            planes, res, cert, om, om_rb, pat, s, radius=2,
            phase_output=True, order=1, prune_exp=1.5, moment_slots=4)

    def cent(res, cert, om, om_rb, shift=True, pool=False):
        ry = jnp.clip(res[..., 0], -1.0, 1.0)
        rx = jnp.clip(res[..., 1], -1.0, 1.0)
        if pool:
            ry, rx = pool2(ry), pool2(rx)
            cert = pool2(cert.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
            om = pool2(om.transpose(2, 0, 1)).transpose(1, 2, 0)
            om_rb = pool2(om_rb.transpose(2, 0, 1)).transpose(1, 2, 0)
        return centroid_planes(ry, rx, cert, om, om_rb, pat, s, taps, phi,
                               cert_shift=shift)

    variants = {
        "o0": (o0, (planes, res, cert, om, om_rb)),
        "o1": (o1, (planes, res, cert, om, om_rb)),
        "cent": (lambda r, c, o, orb: cent(r, c, o, orb),
                 (res, cert, om, om_rb)),
        "cent_ns": (lambda r, c, o, orb: cent(r, c, o, orb, shift=False),
                    (res, cert, om, om_rb)),
        "cent_pool": (lambda r, c, o, orb: cent(r, c, o, orb, shift=False,
                                                pool=True),
                      (res, cert, om, om_rb)),
        "o0+cent_pool": (
            lambda p, r, c, o, orb: (o0(p, r, c, o, orb),
                                     cent(r, c, o, orb, shift=False,
                                          pool=True)),
            (planes, res, cert, om, om_rb)),
        "o0+cent": (
            lambda p, r, c, o, orb: (o0(p, r, c, o, orb),
                                     cent(r, c, o, orb)),
            (planes, res, cert, om, om_rb)),
    }
    rounds = int(os.environ.get("MFSR_BENCH_ROUNDS", "2"))
    results = {}
    for rep in range(rounds):
        for name, (fn, args) in variants.items():
            ms = amortized_ms(fn, args)
            results.setdefault(name, []).append(ms)
            print(f"[rep {rep}] {name:14s} {ms:6.3f} ms", flush=True)
    print("--- medians ---")
    for name, vals in results.items():
        print(f"{name:14s} {float(np.median(vals)):6.3f} ms")


if __name__ == "__main__":
    main()

"""Prototype race: phase-interleave formulations on TPU.

The trace (round 3) shows the final interleave_phases_planes lowers to a
lane-crossing copy + reshape costing ~587 us/burst at city size — a
third of the whole RAW pipeline. Candidates:

  A. current: transpose + reshape (baseline)
  B. interior-pad + sum: out = sum_phase lax.pad(p, interior=s-1, lo=phase)
  C. scatter-matmul on the MXU: q = sum_px p[..., :] @ E_px (0/1)
  D. hierarchical pairwise pad+sum (factor 2 twice)

All produce (s*h, s*w, c) from channel-leading (s, s, c, h, w) phases.
Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/proto_interleave.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo/tools")


def interleave_pad_sum(p):
    """(s, s, c, h, w) -> (s*h, s*w, c) via interior-padded adds."""
    import jax.numpy as jnp
    from jax import lax

    s = p.shape[0]
    c, h, w = p.shape[2], p.shape[3], p.shape[4]
    acc = None
    zero = jnp.array(0.0, p.dtype)
    for py in range(s):
        for px in range(s):
            x = p[py, px]  # (c, h, w)
            cfg = [(0, 0, 0), (py, s - 1 - py, s - 1), (px, s - 1 - px, s - 1)]
            t = lax.pad(x, zero, cfg)  # (c, s*h, s*w)
            acc = t if acc is None else acc + t
    return jnp.moveaxis(acc, 0, -1)


def interleave_matmul(p):
    """x-interleave on the MXU with 0/1 scatter matrices; y via pad+sum."""
    import jax.numpy as jnp
    from jax import lax

    s = p.shape[0]
    c, h, w = p.shape[2], p.shape[3], p.shape[4]
    e = np.zeros((s, w, s * w), np.float32)
    for px in range(s):
        e[px, np.arange(w), s * np.arange(w) + px] = 1.0
    e = jnp.asarray(e)
    # contract px and w together: (py, c, h, s*w)
    q = jnp.einsum("yxchw,xwk->ychk", p, e, precision="highest")
    zero = jnp.array(0.0, p.dtype)
    acc = None
    for py in range(s):
        t = lax.pad(q[py], zero, [(0, 0, 0), (py, s - 1 - py, s - 1), (0, 0, 0)])
        acc = t if acc is None else acc + t
    return jnp.moveaxis(acc, 0, -1)


def interleave_rowstack(p):
    """y-interleave via the (h, s) reshape trick (sublane-level), x via
    interior-pad sum."""
    import jax.numpy as jnp
    from jax import lax

    s = p.shape[0]
    c, h, w = p.shape[2], p.shape[3], p.shape[4]
    zero = jnp.array(0.0, p.dtype)
    acc = None
    for px in range(s):
        t = lax.pad(p[:, px], zero, [(0, 0, 0), (0, 0, 0), (0, 0, 0), (px, s - 1 - px, s - 1)])
        acc = t if acc is None else acc + t  # (s, c, h, s*w)
    # rows: (s, c, h, sw) -> (c, h, s, sw) -> (c, s*h, sw)
    out = jnp.transpose(acc, (1, 2, 0, 3)).reshape(c, s * h, s * w)
    return jnp.moveaxis(out, 0, -1)


def main():
    import jax
    import jax.numpy as jnp

    from profile_stages import amortized_ms

    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        interleave_phases_planes,
    )

    rng = np.random.default_rng(0)
    p_np = rng.uniform(0.0, 1.0, (4, 4, 3, 128, 256)).astype(np.float32)
    p = jnp.asarray(p_np)

    ref = np.asarray(jax.jit(interleave_phases_planes)(p))
    cases = {
        "A transpose+reshape": lambda x: jnp.clip(interleave_phases_planes(x), 0.0, 1.0),
        "B pad+sum": lambda x: jnp.clip(interleave_pad_sum(x), 0.0, 1.0),
        "C matmul-x": lambda x: jnp.clip(interleave_matmul(x), 0.0, 1.0),
        "D padx+rowstack": lambda x: jnp.clip(interleave_rowstack(x), 0.0, 1.0),
    }
    for name, fn in cases.items():
        got = np.asarray(jax.jit(fn)(p))
        err = float(np.abs(got - np.clip(ref, 0.0, 1.0)).max())
        ms = amortized_ms(fn, p, k=24, reps=3)
        print(f"{name:22s} {ms*1000:8.1f} us   maxerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

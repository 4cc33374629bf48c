"""Gatherless kernel-regression merge — the TPU fast path.

Reformulates the accumulate kernels (DeBayerKernels.cu:289-468) for the
VPU: frames are first warped into reference geometry by their per-tile
INTEGER shifts (one structured warp per frame, see ops.warp_fast /
pallas_ops.tile_warp); what remains per output pixel is a STATIC tap
window around its nearest input sample, with the bounded subpixel
residual folded into the per-pixel Gaussian weights. Every tap is a
static shift x elementwise weight — no gathers anywhere, and XLA fuses
the whole tap loop into a handful of VPU passes.

Two volume reductions on top of the round-1 formulation:

  * STATIC TAP PRUNING: with the merge-kernel variance clamped to
    ``k_max`` (output px^2) and the residual clamped to
    ``residual_bound``, a tap's best-case weight is
    exp(-max(0, |k|-rb-|phi|)^2 s^2 / (2 k_max)) per axis; taps bounded
    below e^-6 (~2.5e-3) are dropped at trace time. At the default
    radius=2, rb=1, s=2, k_max=1 this prunes the 7x7 window to exactly
    the reference's 5x5 (DeBayerKernels.cu:317).
  * PLANE-DOMAIN RAW MERGE (``merge_burst_raw_planes``): the RAW path's
    residual/certainty/omega fields are constant per 2x2 Bayer block
    (they are half-resolution estimates), and even-integer warps of the
    mosaic are integer warps of its four half-res CFA planes — so the
    whole accumulation runs at half resolution per plane: ~4x less
    elementwise volume and no wasted multiplies against zero CFA masks.

Weight model matches models.merge (true-displacement weights
w = exp(-1/2 d^T Omega^-1 d) x certainty); parity with the gather-based
oracle is covered by tests/test_fast_path.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops.warp_fast import _shift2d


def _output_phase_offsets(s: int) -> np.ndarray:
    """phi(o % s) = (o + 0.5)/s - 0.5 - o//s: the constant fractional
    position of each output phase relative to its nearest input sample."""
    o = np.arange(s, dtype=np.float32)
    return (o + 0.5) / s - 0.5


def _active_taps(
    r_taps: int, residual_bound: float, scale: int, k_max: float,
    prune_exp: float = 6.0,
):
    """Static tap pruning: keep taps whose best-case Gaussian weight
    exceeds e^-prune_exp. |d|_min per axis = max(0, |k| - rb - max|phi|)
    * s in output-grid units; the weight bound uses the largest clamped
    kernel variance k_max."""
    phi_max = float(np.max(np.abs(_output_phase_offsets(scale))))
    taps = []
    for ky in range(-r_taps, r_taps + 1):
        for kx in range(-r_taps, r_taps + 1):
            dy = max(0.0, abs(ky) - residual_bound - phi_max) * scale
            dx = max(0.0, abs(kx) - residual_bound - phi_max) * scale
            if (dy * dy + dx * dx) / (2.0 * max(k_max, 1e-6)) <= prune_exp:
                taps.append((ky, kx))
    return taps


def _shift_last2(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Edge-clamped static shift of the LAST TWO axes:
    out[..., y, x] = img[..., y+dy, x+dx]."""
    h, w = img.shape[-2], img.shape[-1]
    pad = max(abs(dy), abs(dx), 1)
    pads = ((0, 0),) * (img.ndim - 2) + ((pad, pad), (pad, pad))
    xp = jnp.pad(img, pads, mode="edge")
    return xp[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def merge_burst_fast(
    warped: jnp.ndarray,
    residual: jnp.ndarray,
    certainty: jnp.ndarray,
    omega_inv: jnp.ndarray,
    scale: int,
    radius: int = 2,
    residual_bound: float = 1.0,
    k_max: float = 1.0,
    phase_output: bool = False,
    bf16: bool = False,
    order: int = 0,
    prune_exp: float = 6.0,
    moment_slots: int = 9,
) -> Tuple[jnp.ndarray, ...]:
    """Merge tile-warped RGB frames onto the scale-x output grid.

    warped: (F, H, W, 3) frames already integer-tile-warped to reference
    geometry; residual: (F, H, W, 2) remaining subpixel flow (clamped to
    +-residual_bound); certainty: (F, H, W, 3); omega_inv: (H, W, 3).
    Returns (num, den) at (sH, sW, 3), or in the CHANNEL-LEADING PHASE
    domain (s, s, 3, H, W) when ``phase_output`` — callers then finish
    all pointwise math before one final interleave (the interleave is a
    lane-crossing transpose, ~1.2 ms per array at city size on v5e;
    channel-leading because a 3-minor channel axis pads to 128 lanes).

    order=1: local-linear regression — returns the 9 moment stacks
    (models.merge.solve_order1 order) instead of (num, den), or just
    (m00, m01, m02, b0) with ``moment_slots=4`` (the solve_plugin
    subset); bf16 is ignored (moment cancellation needs f32).
    """
    f, h, w = warped.shape[:3]
    s = scale
    sh, sw = h * s, w * s
    if order == 1:
        bf16 = False
    r_taps = radius + int(np.ceil(residual_bound))
    taps = _active_taps(r_taps, residual_bound, s, k_max, prune_exp)

    # PHASE-SEPARATED accumulation: every output pixel of phase (py, px)
    # shares its nearest input sample with its block, so all tap math runs
    # at INPUT resolution (s^2 phase accumulators) and the s-x output is
    # assembled once at the end — ~s^2 less memory traffic than computing
    # at output resolution.
    phi = _output_phase_offsets(s)

    oxx = omega_inv[..., 0]
    oyy = omega_inv[..., 1]
    oxy = omega_inv[..., 2]

    # CHANNEL-LEADING accumulation: all (H, W, 3) math would put the
    # 3-wide channel axis on the TPU lane dimension (padded to 128 lanes,
    # ~42x wasted VPU slots); frames/channels ride leading axes instead
    # and the phase stack transposes back to channel-minor ONCE at the end
    # bf16 (see merge_burst_raw_planes): weights evaluated in f32, tap
    # products/accumulations in bfloat16, f32 carry across frames
    acc_dt = jnp.bfloat16 if bf16 else jnp.float32
    warped_c = jnp.moveaxis(warped, -1, 1).astype(acc_dt)  # (F, 3, H, W)
    cert_c = jnp.moveaxis(certainty, -1, 1).astype(acc_dt)

    n_acc = moment_slots if order == 1 else 2

    def accumulate_frame(carry, frame_data):
        img, res, cert = frame_data  # (3, H, W), (H, W, 2), (3, H, W)
        res_y = jnp.clip(res[..., 0], -residual_bound, residual_bound)
        res_x = jnp.clip(res[..., 1], -residual_bound, residual_bound)
        # per-phase local accumulators keep the whole tap sum inside one
        # fusible expression (no scatter-adds into the carry)
        acc = [[[None] * s for _ in range(s)] for _ in range(n_acc)]

        def add(k, py, px, term):
            if acc[k][py][px] is None:
                acc[k][py][px] = term
            else:
                acc[k][py][px] = acc[k][py][px] + term

        for ky, kx in taps:
            val = _shift_last2(img, ky, kx)
            cert_k = _shift_last2(cert, ky, kx)
            dy0 = (ky - res_y) * s
            dx0 = (kx - res_x) * s
            for py in range(s):
                dy = dy0 - phi[py] * s
                for px in range(s):
                    dx = dx0 - phi[px] * s
                    wgt = jnp.exp(
                        -0.5
                        * (dx * dx * oxx + dy * dy * oyy + 2.0 * dx * dy * oxy)
                    ).astype(acc_dt)
                    cw = wgt[None] * cert_k
                    cwv = val * cw
                    if order == 0:
                        add(0, py, px, cwv)
                        add(1, py, px, cw)
                    elif n_acc == 4:
                        add(0, py, px, cw)
                        add(1, py, px, cw * dy[None])
                        add(2, py, px, cw * dx[None])
                        add(3, py, px, cwv)
                    else:
                        cwdy = cw * dy[None]
                        cwdx = cw * dx[None]
                        add(0, py, px, cw)
                        add(1, py, px, cwdy)
                        add(2, py, px, cwdx)
                        add(3, py, px, cwdy * dy[None])
                        add(4, py, px, cwdy * dx[None])
                        add(5, py, px, cwdx * dx[None])
                        add(6, py, px, cwv)
                        add(7, py, px, cwv * dy[None])
                        add(8, py, px, cwv * dx[None])
        frames = tuple(
            jnp.stack([jnp.stack(r, 0) for r in acc[k]], 0).astype(jnp.float32)
            for k in range(n_acc)
        )
        return tuple(c + fr for c, fr in zip(carry, frames)), None

    acc0 = tuple(
        jnp.zeros((s, s, 3, h, w), jnp.float32) for _ in range(n_acc)
    )
    accs, _ = jax.lax.scan(
        accumulate_frame, acc0, (warped_c, residual, cert_c)
    )

    if phase_output:
        # CHANNEL-LEADING phases (s, s, 3, H, W): callers finish the
        # pointwise finalize in this layout and interleave once
        # (ops.warp_fast.interleave_phases_planes)
        return accs

    # interleave phases: (s, s, 3, H, W) -> (sH, sW, 3)
    def interleave(acc):
        return acc.transpose(3, 0, 4, 1, 2).reshape(sh, sw, 3)

    return tuple(interleave(a) for a in accs)


def grad_phases(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference gradient of a channel-leading phase stack
    (n, n, C, hh, hw) in OUTPUT pixel units: phase (r, c) holds output
    pixel (n*i + r, n*j + c), so the output-row neighbor of phase r is
    phase r-1 (same plane row), wrapping to phase n-1 one plane row up.
    Plugin-gradient companion of models.merge.grad_image for the fast
    (phase-domain) pipelines."""
    n = x.shape[0]
    # one stack per gradient (differences built per phase slice) — the
    # phase axes are MAJOR, so the slices are views and the subtraction
    # fuses; stacking prev/next separately doubled the materialized
    # traffic (~0.3 ms/iteration at city size before this form)
    gy = jnp.stack(
        [
            0.5
            * (
                (x[r + 1] if r < n - 1 else _shift_last2(x[0], 1, 0))
                - (x[r - 1] if r > 0 else _shift_last2(x[n - 1], -1, 0))
            )
            for r in range(n)
        ],
        axis=0,
    )
    gx = jnp.stack(
        [
            0.5
            * (
                (x[:, c + 1] if c < n - 1 else _shift_last2(x[:, 0], 0, 1))
                - (x[:, c - 1] if c > 0 else _shift_last2(x[:, n - 1], 0, -1))
            )
            for c in range(n)
        ],
        axis=1,
    )
    return gy, gx


def green_guide_planes(planes: jnp.ndarray, cfa) -> jnp.ndarray:
    """Gradient-weighted green estimate at every CFA site, in the plane
    domain: (F, 2, 2, hh, hw) -> same shape, where non-green sites hold
    the directional average of their four full-res green neighbors
    (horizontal/vertical mixed by inverse gradient, the Wu-Zhang
    weighting idea of deBayerGreenKernel, DeBayerKernels.cu:54-149, on
    the 4-neighbor cross) and green sites hold themselves.

    Used by the guided R/B merge: accumulating R - G / B - G color
    differences instead of raw R/B keeps chroma aligned with the sharp
    green channel (the reference fills R/B through exactly these color
    differences in deBayerRedBlueKernel, DeBayerKernels.cu:152-231).
    """
    pat = np.asarray(cfa)
    out = [[None, None], [None, None]]
    eps = 1e-6
    for a in (0, 1):
        for b in (0, 1):
            if int(pat[a][b]) == 1:
                out[a][b] = planes[:, a, b]
                continue
            p = planes[:, a, b]
            # full-res green neighbors (2i+a+-1, 2j+b) and (2i+a, 2j+b+-1)
            up = _shift_last2(planes[:, (a - 1) % 2, b], (a - 1) // 2, 0)
            down = _shift_last2(planes[:, (a + 1) % 2, b], (a + 1) // 2, 0)
            left = _shift_last2(planes[:, a, (b - 1) % 2], 0, (b - 1) // 2)
            right = _shift_last2(planes[:, a, (b + 1) % 2], 0, (b + 1) // 2)
            # same-channel +-2 full-res neighbors = +-1 plane shifts, for
            # the Hamilton-Adams Laplacian correction
            up2 = _shift_last2(p, -1, 0)
            down2 = _shift_last2(p, 1, 0)
            left2 = _shift_last2(p, 0, -1)
            right2 = _shift_last2(p, 0, 1)
            lap_v = 2.0 * p - up2 - down2
            lap_h = 2.0 * p - left2 - right2
            est_v = 0.5 * (up + down) + 0.25 * lap_v
            est_h = 0.5 * (left + right) + 0.25 * lap_h
            gv = jnp.abs(up - down) + jnp.abs(lap_v)
            gh = jnp.abs(left - right) + jnp.abs(lap_h)
            wh = (gv + eps) / (gv + gh + 2.0 * eps)
            out[a][b] = wh * est_h + (1.0 - wh) * est_v
    return jnp.stack(
        [jnp.stack([out[0][0], out[0][1]], 1), jnp.stack([out[1][0], out[1][1]], 1)],
        axis=1,
    )


def merge_burst_raw_planes(
    planes: jnp.ndarray,
    residual: jnp.ndarray,
    certainty: jnp.ndarray,
    omega_inv: jnp.ndarray,
    omega_inv_rb: jnp.ndarray,
    cfa,
    scale: int,
    radius: int = 2,
    residual_bound: float = 1.0,
    k_max: float = 1.0,
    guide: jnp.ndarray | None = None,
    phase_output: bool = False,
    bf16: bool = False,
    order: int = 0,
    prune_exp: float = 6.0,
    moment_slots: int = 9,
    exact_weights: bool = False,
    centroid_prune: float | None = None,
    centroid_bf16: bool = False,
    centroid_block: bool = False,
    centroid_shared_res: bool = False,
    centroid_cert: bool = True,
) -> Tuple[jnp.ndarray, ...]:
    """CFA-aware merge on half-resolution planes
    (accumulateImagesSuperRes equivalent, DeBayerKernels.cu:378-468).

    planes: (F, 2, 2, hh, hw) — the four CFA planes of each Bayer frame,
    already warped to reference geometry by EVEN RAW-integer (= integer
    plane) shifts so the CFA phase is preserved; residual: (F, hh, hw, 2)
    remaining flow in RAW pixel units (constant per Bayer block);
    certainty: (F, hh, hw, 3); omega_inv / omega_inv_rb: (hh, hw, 3)
    Omega^-1 fields in output-px^2 units for the green and the sparser
    R/B channels (MergeConfig.k_min_rb). Returns (num, den) at
    (2*hh*scale, 2*hw*scale, 3).

    A tap (ky, kx) in RAW units lands on plane ((a+ky)%2, (b+kx)%2) at
    half-res offset ((a+ky)//2, (b+kx)//2) for output parity (a, b); the
    Gaussian weight depends only on the Bayer block (residual and omega
    are half-res fields), so each tap needs just two half-res weight
    maps (green / red-blue) shared by all four parities.

    When ``guide`` (green_guide_planes output) is given, R/B samples are
    accumulated as COLOR DIFFERENCES value - guide, so channels 0/2 of
    (num, den) hold merged R-G / B-G fields; the caller reconstructs
    R = G + D_R (see handheld._handheld_raw_fast).

    order=1: local LINEAR regression — returns the 9 moment stacks in
    models.merge.solve_order1 order instead of (num, den). The moment
    fields dy/dx and their pairwise products are hoisted per (tap,
    phase) and shared by all four parities/channels; bf16 is ignored
    (moment cancellation in the 3x3 solve needs f32).
    """
    f = planes.shape[0]
    hh, hw = planes.shape[-2], planes.shape[-1]
    s = scale
    if order == 1:
        bf16 = False
    r_taps = radius + int(np.ceil(residual_bound))
    taps = _active_taps(r_taps, residual_bound, s, k_max, prune_exp)
    phi = _output_phase_offsets(s)
    pat = np.asarray(cfa)
    n_acc = 9 if order == 1 else 2

    # bf16: the Gaussian weights are evaluated in f32 (the quadratic form
    # spans several orders of magnitude before the exp) and the tap
    # PRODUCTS/accumulations run in bfloat16; num/den convert back to f32
    # at the end, ahead of the normalize division.
    acc_dt = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        planes = planes.astype(acc_dt)
        certainty = certainty.astype(acc_dt)
        if guide is not None:
            guide = guide.astype(acc_dt)

    res_y = jnp.clip(residual[..., 0], -residual_bound, residual_bound)
    res_x = jnp.clip(residual[..., 1], -residual_bound, residual_bound)

    # order-1: PARITY-INTERPOLATED residuals. The residual field is a
    # half-res estimate, constant per 2x2 Bayer block; each of the 2s
    # output phase rows inside a block sits at RAW offset a + phi[py],
    # i.e. half-res coordinate i + (a + phi[py] - 0.5) / 2 — the order-1
    # displacement terms evaluate the flow THERE via a 2-tap bilinear
    # blend of the residual field (exactly what the oracle's
    # resize(flow, sh, sw, "bilinear") does per output pixel). Weights
    # keep the block-center residual: WLS stays valid under any weights,
    # and only d-accuracy moves the fit.
    resY1 = [None] * (2 * s)
    resX1 = [None] * (2 * s)
    if order == 1:
        for a in (0, 1):
            for p in range(s):
                g = (a + phi[p] - 0.5) / 2.0
                ga = abs(float(g))
                sgn = 1 if g > 0 else -1
                resY1[a * s + p] = jnp.clip(
                    (1.0 - ga) * res_y + ga * _shift_last2(res_y, sgn, 0),
                    -residual_bound, residual_bound,
                )
                resX1[a * s + p] = jnp.clip(
                    (1.0 - ga) * res_x + ga * _shift_last2(res_x, 0, sgn),
                    -residual_bound, residual_bound,
                )

    def quad(dx, dy, om):
        return jnp.exp(
            -0.5
            * (
                dx * dx * om[..., 0]
                + dy * dy * om[..., 1]
                + 2.0 * dx * dy * om[..., 2]
            )
        ).astype(acc_dt)

    if order == 1:
        stacks = _merge_planes_order1(
            planes, certainty, res_y, res_x, resY1, resX1,
            omega_inv, omega_inv_rb, pat, s, taps, phi, guide,
            slots=moment_slots, exact_weights=exact_weights,
            centroid_bf16=centroid_bf16, centroid_block=centroid_block,
            centroid_shared_res=centroid_shared_res,
            centroid_cert=centroid_cert,
            centroid_taps=(
                None
                if centroid_prune is None
                else set(
                    _active_taps(
                        r_taps, residual_bound, s, k_max, centroid_prune
                    )
                )
            ),
        )
    else:
        # accumulators: [k][py][px][a][b][channel] -> (hh, hw) or None
        acc = [
            [[[[[None] * 3 for _ in range(2)] for _ in range(2)]
              for _ in range(s)] for _ in range(s)]
            for _ in range(n_acc)
        ]

        def add(k, py, px, a, b, ch, term):
            cell = acc[k][py][px][a][b]
            cell[ch] = term if cell[ch] is None else cell[ch] + term

        for ky, kx in taps:
            u = (ky - res_y) * s  # (F, hh, hw)
            v = (kx - res_x) * s
            w_g = [[None] * s for _ in range(s)]
            w_rb = [[None] * s for _ in range(s)]
            for py in range(s):
                for px in range(s):
                    w_g[py][px] = quad(
                        v - phi[px] * s, u - phi[py] * s, omega_inv
                    )
                    w_rb[py][px] = quad(
                        v - phi[px] * s, u - phi[py] * s, omega_inv_rb
                    )
            for a in (0, 1):
                qa, da = (a + ky) % 2, (a + ky) // 2
                for b in (0, 1):
                    qb, db = (b + kx) % 2, (b + kx) // 2
                    ch = int(pat[qa][qb])
                    src = planes[:, qa, qb]
                    if guide is not None and ch != 1:
                        src = src - guide[:, qa, qb]
                    val = _shift_last2(src, da, db)
                    cert_s = _shift_last2(certainty[..., ch], da, db)
                    for py in range(s):
                        for px in range(s):
                            w = w_g[py][px] if ch == 1 else w_rb[py][px]
                            wc = w * cert_s  # (F, hh, hw)
                            add(0, py, px, a, b, ch, (wc * val).sum(0))
                            add(1, py, px, a, b, ch, wc.sum(0))

        zero = jnp.zeros((hh, hw), acc_dt)

        def stack_phases(acc_k):
            # -> CHANNEL-LEADING (2s, 2s, 3, hh, hw) with phase index
            # (a*s + py, b*s + px): output row (2i+a)*s + py = (2s)*i +
            # (a*s + py), the standard phase layout of the TOTAL
            # upsampling factor 2s (interleave_phases_planes applies
            # it). Channels ride a leading axis — a 3-minor axis would
            # pad to 128 TPU lanes.
            rows = []
            for a in (0, 1):
                for py in range(s):
                    cols = []
                    for b in (0, 1):
                        for px in range(s):
                            cols.append(
                                jnp.stack(
                                    [c if c is not None else zero
                                     for c in acc_k[py][px][a][b]],
                                    axis=0,
                                )
                            )
                    rows.append(jnp.stack(cols, 0))
            return jnp.stack(rows, 0)  # (2s, 2s, 3, hh, hw)

        stacks = tuple(
            stack_phases(acc[k]).astype(jnp.float32) for k in range(n_acc)
        )
    if phase_output:
        return stacks

    from multi_frame_super_resolution_tpu.ops.warp_fast import (
        interleave_phases_planes,
    )

    return tuple(interleave_phases_planes(p) for p in stacks)


def _merge_planes_order1(
    planes, certainty, res_y, res_x, resY1, resX1,
    omega_inv, omega_inv_rb, pat, s, taps, phi, guide,
    slots: int = 9,
    exact_weights: bool = False,
    centroid_taps=None,
    centroid_bf16: bool = False,
    centroid_block: bool = False,
    centroid_shared_res: bool = False,
    centroid_cert: bool = True,
):
    """Stacked-phase rho-fold accumulation for the order-1 plane merge.

    Two structural optimizations over the direct moment form (which
    multiplied every tap by per-phase displacement FIELDS — ~11.6k HLO
    ops at s=2, 88 s XLA:CPU compile):

      * the s^2 output phases ride ONE leading array axis, so each tap
        is a handful of ops on (s^2, F, hh, hw) arrays instead of s^2
        Python-unrolled op sets;
      * the frame axis DIES inside each tap: with
        dy = s*(ky - rho_y), rho_y = res'_y + phi_y constant across
        taps, each tap's nine moment contributions are products of at
        most two displacement fields with w*c (or w*c*v), reduced over
        F immediately. The persistent accumulators are 9 x
        (s^2, hh, hw) per CFA cell instead of 9 x (s^2, F, hh, hw)
        (the round-4 S-moment form kept the frame axis live across the
        whole tap loop: ~5x the accumulator HBM traffic, 3.06 ms vs
        0.73 ms order-0 on v5e at city size).
        rho uses the PARITY-INTERPOLATED residual (resY1/resX1), i.e.
        the oracle's bilinear per-output-pixel flow; the weights keep
        the block-center residual (WLS is valid under any weights).

    Returns the 9 stacks (m00, m01, m02, m11, m12, m22, b0, b1, b2),
    each (2s, 2s, 3, hh, hw), in models.merge.solve_order1 order — or,
    with ``slots=4``, only (m00, m01, m02, b0): all the plugin-gradient
    solver consumes (merge.solve_plugin), at ~half the accumulate
    volume.
    """
    f = planes.shape[0]
    hh, hw = planes.shape[-2], planes.shape[-1]
    nph = s * s
    # certless shared centroid (MergeConfig.centroid_cert=False): the
    # block-center Gaussian weight is PARITY-independent, so without the
    # certainty factor the centroid moments are identical for every
    # (parity, channel) cell of a kernel family — three shared
    # accumulator chains per family replace 2 chains x 16 cells. Only
    # meaningful for the plugin (slots=4) solver.
    certless = slots == 4 and not centroid_cert and not exact_weights
    # shared_res is a refinement OF the block-center centroid form (its
    # slots are only filled in that branch) — it implies centroid_block
    centroid_block = centroid_block or centroid_shared_res
    phi_y = np.repeat(phi, s)  # (nph,) phase row offset, ph = py*s + px
    phi_x = np.tile(phi, s)
    phiy_b = jnp.asarray(phi_y * s, jnp.float32).reshape(nph, 1, 1, 1)
    phix_b = jnp.asarray(phi_x * s, jnp.float32).reshape(nph, 1, 1, 1)
    # input-unit per-phase offsets for the block-center centroid fold
    phiy_r = jnp.asarray(phi_y, jnp.float32).reshape(nph, 1, 1)
    phix_r = jnp.asarray(phi_x, jnp.float32).reshape(nph, 1, 1)

    def quadp(dx, dy, om):
        # om: (hh, hw, 3) broadcasting against (nph, F, hh, hw)
        return jnp.exp(
            -0.5
            * (
                dx * dx * om[..., 0]
                + dy * dy * om[..., 1]
                + 2.0 * dx * dy * om[..., 2]
            )
        )

    # per-(a, phase-row) query offsets rho (RAW units), (nph, F, hh, hw)
    def rho_stack(res1, base, offs, tile_axis):
        # rows: index a*s + p ordered over p; expand to nph by px/py
        fields = [res1[base * s + p] + float(offs[p]) for p in range(s)]
        st = jnp.stack(fields, 0)  # (s, F, hh, hw)
        if tile_axis == "y":  # phase index ph = py*s + px -> repeat rows
            return jnp.repeat(st, s, axis=0)
        return jnp.tile(st, (s, 1, 1, 1))

    need_rho = slots != 4 or exact_weights
    if need_rho:
        rho_y = {a: rho_stack(resY1, a, phi, "y") for a in (0, 1)}
        rho_x = {b: rho_stack(resX1, b, phi, "x") for b in (0, 1)}
    else:
        rho_y = rho_x = None
    if slots == 4 and not centroid_block and not certless:
        # COMPACT parity-rho fields (s, F, hh, hw): the (nph, ...) stacks
        # above repeat/tile these along the phase axis, and XLA
        # materializes that repeat when it feeds a per-tap product —
        # nph/s times the read bandwidth for no information. The per-tap
        # centroid reduces below broadcast the compact form against the
        # phase-split weight view instead. (An F-live factored
        # accumulator — sum_tap wc per cell, rho applied once at the end
        # — was measured SLOWER: 12 (nph, F, hh, hw) accumulator
        # round-trips per tap beat the in-fusion products it saved,
        # ~265 us in the finalize alone, round-4 device trace.)
        rho_y_c = {
            a: jnp.stack(
                [resY1[a * s + p] + float(phi[p]) for p in range(s)], 0
            )
            for a in (0, 1)
        }
        rho_x_c = {
            b: jnp.stack(
                [resX1[b * s + p] + float(phi[p]) for p in range(s)], 0
            )
            for b in (0, 1)
        }
    sf = float(s)

    # m-moment accumulators per [a][b][ch]: `slots` slots of
    # (nph, hh, hw) — solve_order1 order (m00, m01, m02, m11, m12, m22,
    # b0, b1, b2), or the solve_plugin subset (m00, m01, m02, b0).
    # centroid_shared_res adds two private (1, hh, hw) slots holding the
    # phase-0 residual-weight sums, folded into m01/m02 after the loop.
    n_slots = slots + (2 if centroid_shared_res else 0)
    m_cells = [[[[None] * n_slots for _ in range(3)] for _ in range(2)]
               for _ in range(2)]
    # certless shared centroid chains, each (nph, hh, hw). A cell
    # (a, b, ch) accumulates only taps whose source parity carries its
    # channel, so chains are keyed by TAP PARITY: green taps of a cell
    # class share (ky+kx) % 2 (the two green CFA positions differ by
    # (1,1)), and single-position channels (R/B) share (ky%2, kx%2) —
    # 2 + 4 chains of (sum w, folded m01, m02) serve all 16 cells.
    if certless:
        cshared = {
            **{("g", c): [None] * 3 for c in (0, 1)},
            **{("rb", ty, tx): [None] * 3 for ty in (0, 1) for tx in (0, 1)},
        }
    else:
        cshared = None

    for ky, kx in taps:
        if not exact_weights:
            u = (ky - res_y) * s  # (F, hh, hw), block-center weights
            v = (kx - res_x) * s
            dy_w = u[None] - phiy_b  # (nph, F, hh, hw)
            dx_w = v[None] - phix_b
            w_g = quadp(dx_w, dy_w, omega_inv)
            w_rb = quadp(dx_w, dy_w, omega_inv_rb)
            if certless:
                # shared certless centroid: one set of reduces per
                # (kernel family, tap parity) chain serves every cell
                # reading that chain (the block-center weight is
                # parity-independent; phi and the tap index fold as
                # per-phase scalars). When omega_inv_rb == omega_inv
                # (default k_min_rb <= k_min) XLA CSEs the families.
                for cid, wf in (
                    (("g", (ky + kx) % 2), w_g),
                    (("rb", ky % 2, kx % 2), w_rb),
                ):
                    red_w = wf.sum(1, dtype=jnp.float32)
                    red_ry = (res_y * wf).sum(1, dtype=jnp.float32)
                    red_rx = (res_x * wf).sum(1, dtype=jnp.float32)
                    terms = (
                        red_w,
                        sf * ((float(ky) - phiy_r) * red_w - red_ry),
                        sf * ((float(kx) - phix_r) * red_w - red_rx),
                    )
                    cell = cshared[cid]
                    for i, red in enumerate(terms):
                        cell[i] = red if cell[i] is None else cell[i] + red
        # query-point displacements, shared across b / a respectively
        # (slots==4 folds ky/kx as scalars instead — no fields needed)
        if slots != 4 or exact_weights:
            dy_m = {a: sf * (float(ky) - rho_y[a]) for a in (0, 1)}
            dx_m = {b: sf * (float(kx) - rho_x[b]) for b in (0, 1)}
        else:
            dy_m = dx_m = None
        for a in (0, 1):
            qa, da = (a + ky) % 2, (a + ky) // 2
            dy = None if dy_m is None else dy_m[a]
            for b in (0, 1):
                qb, db = (b + kx) % 2, (b + kx) // 2
                dx = None if dx_m is None else dx_m[b]
                ch = int(pat[qa][qb])
                src = planes[:, qa, qb]
                if guide is not None and ch != 1:
                    src = src - guide[:, qa, qb]
                val = _shift_last2(src, da, db)
                cert_s = _shift_last2(certainty[..., ch], da, db)
                if exact_weights:
                    # weights at the SAME parity-interpolated per-pixel
                    # displacement as the moments (the oracle evaluates
                    # its Gaussian there); one quad per (a, b) — each
                    # cell has a single channel, so this is 4 quads/tap
                    # vs the block-center form's 2
                    w = quadp(dx, dy, omega_inv if ch == 1 else omega_inv_rb)
                else:
                    w = w_g if ch == 1 else w_rb
                wc = w * cert_s[None]
                wcv = wc * val[None]
                cell = m_cells[a][b][ch]
                if certless:
                    # per-cell work is exactly the order-0 merge; the
                    # centroid lives in the shared chains above
                    for i, term in ((0, wc), (3, wcv)):
                        red = term.sum(1, dtype=jnp.float32)
                        cell[i] = red if cell[i] is None else cell[i] + red
                    continue
                if slots == 4 and centroid_taps is not None and (
                    (ky, kx) not in centroid_taps
                ):
                    # centroid moments restricted to the inner taps (the
                    # plugin correction is small and smooth; outer taps
                    # carry little marginal centroid information) —
                    # only m00 and b0 for this tap
                    for i, term in ((0, wc), (3, wcv)):
                        red = term.sum(1)
                        cell[i] = red if cell[i] is None else cell[i] + red
                    continue
                if slots == 4 and centroid_block:
                    # BLOCK-CENTER centroid flow: rho = res + phi with
                    # res the same block-center field the WEIGHT pass
                    # reads in this very fusion, so sum_F res*wc adds no
                    # input bandwidth (phi folds as a per-phase scalar
                    # onto red_wc). Drops the parity-interpolated
                    # sub-block flow variation from the centroid only —
                    # the plugin correction is a smooth ~0.2 px bias
                    # term (fidelity impact measured in BENCH_NOTES
                    # round-4 notes).
                    red_wc = wc.sum(1, dtype=jnp.float32)
                    if centroid_shared_res:
                        # residual-average reduces at ONE phase (wc[:1]
                        # is a view inside the same fusion — the full wc
                        # is already live for red_wc): the weighted-mean
                        # residual mu = sum res*wc / m00 is taken as
                        # phase-independent; the fold into m01/m02 (with
                        # each phase's own m00 as the multiplier, not
                        # phase 0's raw sum) happens after the tap loop.
                        # phi stays exact per phase via phiy_r/phix_r.
                        red_ry = (res_y * wc[:1]).sum(1, dtype=jnp.float32)
                        red_rx = (res_x * wc[:1]).sum(1, dtype=jnp.float32)
                        terms = (
                            (0, red_wc),
                            (1, sf * (float(ky) - phiy_r) * red_wc),
                            (2, sf * (float(kx) - phix_r) * red_wc),
                            (3, wcv.sum(1, dtype=jnp.float32)),
                            (slots, red_ry),
                            (slots + 1, red_rx),
                        )
                    else:
                        red_ry = (res_y * wc).sum(1, dtype=jnp.float32)
                        red_rx = (res_x * wc).sum(1, dtype=jnp.float32)
                        terms = (
                            (0, red_wc),
                            (1, sf * ((float(ky) - phiy_r) * red_wc - red_ry)),
                            (2, sf * ((float(kx) - phix_r) * red_wc - red_rx)),
                            (3, wcv.sum(1, dtype=jnp.float32)),
                        )
                    for i, red in terms:
                        cell[i] = red if cell[i] is None else cell[i] + red
                    continue
                if slots == 4:
                    # exact algebra: dy = s(ky - rho) so
                    # sum dy*wc = s(ky * sum wc - sum rho*wc) — the tap
                    # index folds as a SCALAR onto the m00 reduce, and
                    # the rho part rides the SAME fusion that produces
                    # wc, reading only the COMPACT (s, F, hh, hw) rho
                    # fields (see rho_y_c above): wc is in-register
                    # there, so the extra per-tap cost is two broadcast
                    # products + two small reduce outputs.
                    red_wc = wc.sum(1, dtype=jnp.float32)
                    wc5 = wc.reshape(s, s, f, hh, hw)
                    if centroid_bf16:
                        # bf16 products / f32 reduces on the (small)
                        # correction-feeding moments only — measured
                        # slower on v5e (casts without bandwidth wins),
                        # kept as a knob for other chips
                        wc5 = wc5.astype(jnp.bfloat16)
                        ry_p = rho_y_c[a].astype(jnp.bfloat16)[:, None]
                        rx_p = rho_x_c[b].astype(jnp.bfloat16)[None, :]
                    else:
                        ry_p = rho_y_c[a][:, None]
                        rx_p = rho_x_c[b][None, :]
                    red_ry = (ry_p * wc5).sum(2, dtype=jnp.float32)
                    red_rx = (rx_p * wc5).sum(2, dtype=jnp.float32)
                    terms = (
                        (0, red_wc),
                        (1, sf * (float(ky) * red_wc
                                  - red_ry.reshape(nph, hh, hw))),
                        (2, sf * (float(kx) * red_wc
                                  - red_rx.reshape(nph, hh, hw))),
                        (3, wcv.sum(1, dtype=jnp.float32)),
                    )
                    for i, red in terms:
                        cell[i] = red if cell[i] is None else cell[i] + red
                    continue
                full = (
                    wc, dy * wc, dx * wc, dy * dy * wc, dy * dx * wc,
                    dx * dx * wc, wcv, dy * wcv, dx * wcv,
                )
                for i, term in enumerate(full):
                    # frame axis dies here
                    red = term.sum(1, dtype=jnp.float32)
                    cell[i] = red if cell[i] is None else cell[i] + red

    if centroid_shared_res:
        # fold the shared residual average into m01/m02: with
        # mu = R0 / m00[phase 0] the exact-per-phase term sum res*wc[ph]
        # is approximated as mu * m00[ph] (the weighted-mean residual is
        # phase-independent; only its per-phase weight NORMALIZATION is
        # kept exact). Where phase 0 carries no weight the cell is
        # fallback-blended anyway — mu is zeroed there.
        for a in (0, 1):
            for b in (0, 1):
                for ch in range(3):
                    cell = m_cells[a][b][ch]
                    if cell[0] is None or cell[slots] is None:
                        # cell untouched, or every tap of this cell was
                        # outside centroid_taps (no residual slots)
                        continue
                    m00_0 = cell[0][:1]
                    inv0 = jnp.where(
                        m00_0 > 1e-8, 1.0 / jnp.maximum(m00_0, 1e-8), 0.0
                    )
                    cell[1] = cell[1] - sf * cell[slots] * inv0 * cell[0]
                    cell[2] = cell[2] - sf * cell[slots + 1] * inv0 * cell[0]

    zero = jnp.zeros((hh, hw), jnp.float32)

    def stack_m(k):
        rows = []
        for a in (0, 1):
            for py in range(s):
                cols = []
                for b in (0, 1):
                    for px in range(s):
                        ph = py * s + px
                        cols.append(
                            jnp.stack(
                                [
                                    m_cells[a][b][ch][k][ph]
                                    if m_cells[a][b][ch][k] is not None
                                    else zero
                                    for ch in range(3)
                                ],
                                axis=0,
                            )
                        )
                rows.append(jnp.stack(cols, 0))
        return jnp.stack(rows, 0)  # (2s, 2s, 3, hh, hw)

    if certless:
        # finalize the shared centroid to PRECOMPUTED (cy, cx) fields in
        # the same (2s, 2s, 3, hh, hw) layout (consumed by
        # merge.solve_plugin with precomputed_centroid=True). Cell
        # (a, b, ch) reads the chain whose tap-parity subset carries its
        # channel: for a single-position channel at CFA position
        # (pa, pb), taps with ky = pa - a, kx = pb - b (mod 2); for
        # green, taps with (ky + kx) = (pa + pb - a - b) (mod 2).
        cent = {}
        for cid, cell in cshared.items():
            wsum, m1, m2 = cell
            if wsum is None:
                cent[cid] = None
                continue
            inv = jnp.where(wsum > 1e-8, 1.0 / jnp.maximum(wsum, 1e-8), 0.0)
            cent[cid] = (
                jnp.clip(m1 * inv, -2.0, 2.0),
                jnp.clip(m2 * inv, -2.0, 2.0),
            )
        pos = {int(pat[qa][qb]): (qa, qb) for qa in (0, 1) for qb in (0, 1)}
        g_pos = [(qa, qb) for qa in (0, 1) for qb in (0, 1)
                 if int(pat[qa][qb]) == 1]

        def chain_for(a, b, ch):
            if ch == 1:
                if not g_pos:
                    return None
                pa, pb = g_pos[0]
                return cent[("g", (pa + pb - a - b) % 2)]
            if ch not in pos:
                return None
            pa, pb = pos[ch]
            return cent[("rb", (pa - a) % 2, (pb - b) % 2)]

        zero2 = (zero, zero)

        def stack_c(idx):
            rows = []
            for a in (0, 1):
                for py in range(s):
                    cols = []
                    for b in (0, 1):
                        for px in range(s):
                            ph = py * s + px
                            cols.append(jnp.stack(
                                [
                                    (chain_for(a, b, ch) or zero2)[idx][ph]
                                    for ch in range(3)
                                ],
                                0,
                            ))
                    rows.append(jnp.stack(cols, 0))
            return jnp.stack(rows, 0)

        return (stack_m(0), stack_c(0), stack_c(1), stack_m(3))

    return tuple(stack_m(k) for k in range(slots))


def raw_to_planes(raw: jnp.ndarray) -> jnp.ndarray:
    """Bayer mosaic(s) (..., H, W) -> CFA planes (..., 2, 2, H//2, W//2):
    planes[..., a, b] = raw[..., a::2, b::2].

    The column de-interleave contracts the minor axis against a 0/1
    selector on the MXU — the reshape+moveaxis form lowers to a
    lane-crossing relayout copy (48 us/burst at city size, round-3
    device trace). Rows split via a free major-axis reshape. The
    selector matmul at precision="high" reconstructs f32 values to
    ~2^-21 relative (≈1e-7 absolute on [0,1] data)."""
    h, w = raw.shape[-2], raw.shape[-1]
    hh, hw = h // 2, w // 2
    x = raw[..., : hh * 2, : hw * 2].reshape(raw.shape[:-2] + (hh, 2, hw * 2))
    e = np.zeros((hw * 2, 2, hw), np.float32)
    e[2 * np.arange(hw), 0, np.arange(hw)] = 1.0
    e[2 * np.arange(hw) + 1, 1, np.arange(hw)] = 1.0
    return jnp.einsum(
        "...hav,vbk->...abhk", x, jnp.asarray(e, raw.dtype), precision="high"
    )


def planes_to_raw(planes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of raw_to_planes: (..., 2, 2, hh, hw) -> (..., 2*hh, 2*hw).
    Column interleave as an MXU scatter matmul; row interleave via a
    non-minor transpose + free reshape (see raw_to_planes)."""
    hh, hw = planes.shape[-2], planes.shape[-1]
    e = np.zeros((2, hw, 2 * hw), np.float32)
    e[0, np.arange(hw), 2 * np.arange(hw)] = 1.0
    e[1, np.arange(hw), 2 * np.arange(hw) + 1] = 1.0
    cols = jnp.einsum(
        "...abhk,bkw->...ahw", planes, jnp.asarray(e, planes.dtype),
        precision="high",
    )  # (..., 2, hh, 2*hw)
    rows = jnp.moveaxis(cols, -3, -2)  # non-minor swap: (..., hh, 2, 2*hw)
    return rows.reshape(planes.shape[:-4] + (2 * hh, 2 * hw))

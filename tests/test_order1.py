"""Unit oracles for the order-1 (local-linear) merge path (round 4).

The production order-1 accumulators are algebraically rearranged for the
TPU — the plane merge factors displacements out of the tap loop into
S-moment tap sums with scalar weights plus a per-pixel correction
(fast_merge._merge_planes_order1), and the RGB fast merge rides stacked
phase axes. These tests pin both against an INDEPENDENT naive numpy
accumulation of the defining moments (sum w*{1,dy,dx,dy2,dydx,dx2} and
sum w*v*{1,dy,dx}), plus an exactness property of the solver: local
linear regression reproduces an exactly-linear sample field at the query
point regardless of sample placement (the centroid bias that order-0
suffers — models/merge.py docstring; ref DeBayerKernels.cu:378-468 is
the order-0 form).
"""

import jax.numpy as jnp
import numpy as np
import pytest


def _shiftn(a, dy, dx):
    """Edge-clamped static shift on the last two axes (numpy)."""
    h, w = a.shape[-2], a.shape[-1]
    pad = max(abs(dy), abs(dx), 1)
    widths = [(0, 0)] * (a.ndim - 2) + [(pad, pad), (pad, pad)]
    xp = np.pad(a, widths, mode="edge")
    return xp[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w]


def _naive_raw_planes_order1(
    planes, residual, certainty, om_g, om_rb, cfa, s, radius,
    residual_bound, k_max, prune_exp, guide=None,
):
    """Defining-moments accumulation, straight from the math."""
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        _active_taps,
        _output_phase_offsets,
    )

    f, _, _, hh, hw = planes.shape
    pat = np.asarray(cfa)
    r_taps = radius + int(np.ceil(residual_bound))
    taps = _active_taps(r_taps, residual_bound, s, k_max, prune_exp)
    phi = _output_phase_offsets(s)
    rb = residual_bound
    res_y = np.clip(residual[..., 0], -rb, rb)
    res_x = np.clip(residual[..., 1], -rb, rb)

    # parity-interpolated residuals at the 2s output phase rows/cols
    res_y1, res_x1 = {}, {}
    for a in (0, 1):
        for p in range(s):
            g = (a + phi[p] - 0.5) / 2.0
            ga, sgn = abs(float(g)), (1 if g > 0 else -1)
            res_y1[a * s + p] = np.clip(
                (1 - ga) * res_y + ga * _shiftn(res_y, sgn, 0), -rb, rb
            )
            res_x1[a * s + p] = np.clip(
                (1 - ga) * res_x + ga * _shiftn(res_x, 0, sgn), -rb, rb
            )

    out = np.zeros((9, 2 * s, 2 * s, 3, hh, hw), np.float64)
    for ky, kx in taps:
        for a in (0, 1):
            qa, da = (a + ky) % 2, (a + ky) // 2
            for b in (0, 1):
                qb, db = (b + kx) % 2, (b + kx) // 2
                ch = int(pat[qa][qb])
                src = planes[:, qa, qb]
                if guide is not None and ch != 1:
                    src = src - guide[:, qa, qb]
                val = _shiftn(src, da, db)
                cert = _shiftn(certainty[..., ch], da, db)
                om = om_g if ch == 1 else om_rb
                for py in range(s):
                    for px in range(s):
                        # weights at the block-center residual
                        u = (ky - res_y) * s - phi[py] * s
                        v = (kx - res_x) * s - phi[px] * s
                        w = np.exp(
                            -0.5 * (v * v * om[..., 0] + u * u * om[..., 1]
                                    + 2 * v * u * om[..., 2])
                        ) * cert
                        # moments at the parity-interpolated displacement
                        dy = (ky - res_y1[a * s + py] - phi[py]) * s
                        dx = (kx - res_x1[b * s + px] - phi[px]) * s
                        ms = (w, w * dy, w * dx, w * dy * dy, w * dy * dx,
                              w * dx * dx, w * val, w * val * dy, w * val * dx)
                        for k in range(9):
                            out[k, a * s + py, b * s + px, ch] += ms[k].sum(0)
    return out


@pytest.mark.parametrize("guided", [False, True])
def test_raw_planes_order1_matches_naive(rng, guided):
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        green_guide_planes,
        merge_burst_raw_planes,
    )

    f, hh, hw, s = 3, 8, 10, 2
    cfa = [[1, 0], [2, 1]]
    planes = rng.random((f, 2, 2, hh, hw)).astype(np.float32)
    residual = rng.normal(0, 0.4, (f, hh, hw, 2)).astype(np.float32)
    cert = rng.random((f, hh, hw, 3)).astype(np.float32)
    om_g = (rng.random((hh, hw, 3)) * 0.5 + 0.5).astype(np.float32)
    om_g[..., 2] = 0.1
    om_rb = (rng.random((hh, hw, 3)) * 0.5 + 0.4).astype(np.float32)
    om_rb[..., 2] = 0.05
    guide = (
        np.asarray(green_guide_planes(jnp.asarray(planes), cfa))
        if guided else None
    )

    got = merge_burst_raw_planes(
        jnp.asarray(planes), jnp.asarray(residual), jnp.asarray(cert),
        jnp.asarray(om_g), jnp.asarray(om_rb), cfa, s,
        radius=1, residual_bound=0.5, k_max=1.0,
        guide=None if guide is None else jnp.asarray(guide),
        phase_output=True, order=1, prune_exp=3.0,
    )
    want = _naive_raw_planes_order1(
        planes, residual, cert, om_g, om_rb, cfa, s,
        radius=1, residual_bound=0.5, k_max=1.0, prune_exp=3.0, guide=guide,
    )
    assert len(got) == 9
    for k in range(9):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k], rtol=2e-4, atol=2e-4
        )


def test_rgb_fast_order1_matches_naive(rng):
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        _active_taps,
        _output_phase_offsets,
        merge_burst_fast,
    )

    f, h, w, s = 2, 8, 10, 2
    radius, rb, k_max, prune_exp = 1, 0.5, 1.0, 3.0
    warped = rng.random((f, h, w, 3)).astype(np.float32)
    residual = rng.normal(0, 0.4, (f, h, w, 2)).astype(np.float32)
    cert = rng.random((f, h, w, 3)).astype(np.float32)
    om = (rng.random((h, w, 3)) * 0.5 + 0.5).astype(np.float32)
    om[..., 2] = 0.1

    got = merge_burst_fast(
        jnp.asarray(warped), jnp.asarray(residual), jnp.asarray(cert),
        jnp.asarray(om), s, radius, rb, k_max,
        phase_output=True, order=1, prune_exp=prune_exp,
    )

    taps = _active_taps(radius + 1, rb, s, k_max, prune_exp)
    phi = _output_phase_offsets(s)
    res_y = np.clip(residual[..., 0], -rb, rb)
    res_x = np.clip(residual[..., 1], -rb, rb)
    want = np.zeros((9, s, s, 3, h, w), np.float64)
    for ky, kx in taps:
        val = _shiftn(np.moveaxis(warped, -1, 1), ky, kx)  # (F, 3, H, W)
        cs = _shiftn(np.moveaxis(cert, -1, 1), ky, kx)
        for py in range(s):
            dy = (ky - res_y - phi[py]) * s
            for px in range(s):
                dx = (kx - res_x - phi[px]) * s
                wgt = np.exp(
                    -0.5 * (dx * dx * om[..., 0] + dy * dy * om[..., 1]
                            + 2 * dx * dy * om[..., 2])
                )
                cw = wgt[:, None] * cs
                dye, dxe = dy[:, None], dx[:, None]
                ms = (cw, cw * dye, cw * dxe, cw * dye * dye, cw * dye * dxe,
                      cw * dxe * dxe, cw * val, cw * val * dye, cw * val * dxe)
                for k in range(9):
                    want[k, py, px] += ms[k].sum(0)
    assert len(got) == 9
    for k in range(9):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k], rtol=2e-4, atol=2e-4
        )


def test_solve_order1_exact_on_linear_field(rng):
    """Samples of v(y, x) = c + gy*y + gx*x at scattered displacements:
    the order-1 estimate recovers c exactly (ridge=0), while the
    weighted average (order-0) lands at the sample centroid and misses
    by <grad, centroid> — the bias the order-1 merge removes."""
    from multi_frame_super_resolution_tpu.models.merge import solve_order1

    h, w = 6, 7
    c = rng.random((h, w, 3))
    gy = rng.normal(0, 1, (h, w, 3))
    gx = rng.normal(0, 1, (h, w, 3))
    n = 12
    dys = rng.normal(0.4, 1.0, (n, h, w, 3))
    dxs = rng.normal(-0.3, 1.0, (n, h, w, 3))
    ws = rng.random((n, h, w, 3)) + 0.1
    vals = c + gy * dys + gx * dxs
    m = [np.zeros((h, w, 3)) for _ in range(9)]
    for i in range(n):
        wi, dy, dx, v = ws[i], dys[i], dxs[i], vals[i]
        for k, t in enumerate((wi, wi * dy, wi * dx, wi * dy * dy,
                               wi * dy * dx, wi * dx * dx, wi * v,
                               wi * v * dy, wi * v * dx)):
            m[k] += t
    est, m00 = solve_order1(tuple(jnp.asarray(x, jnp.float32) for x in m),
                            ridge=0.0)
    np.testing.assert_allclose(np.asarray(est), c, rtol=5e-3, atol=5e-3)
    centroid_bias = np.abs(
        np.asarray(m[6]) / np.asarray(m[0]) - c
    ).mean()
    assert centroid_bias > 0.1  # order-0 would actually be biased here


def test_compact_moments_match_full(rng):
    """moment_slots=4 returns exactly slots (m00, m01, m02, b0) of the
    9-slot accumulation (the solve_plugin subset)."""
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        merge_burst_raw_planes,
    )

    f, hh, hw, s = 3, 8, 10, 2
    cfa = [[1, 0], [2, 1]]
    planes = rng.random((f, 2, 2, hh, hw)).astype(np.float32)
    residual = rng.normal(0, 0.4, (f, hh, hw, 2)).astype(np.float32)
    cert = rng.random((f, hh, hw, 3)).astype(np.float32)
    om_g = (rng.random((hh, hw, 3)) * 0.5 + 0.5).astype(np.float32)
    om_g[..., 2] = 0.1
    om_rb = om_g * 0.8
    args = (
        jnp.asarray(planes), jnp.asarray(residual), jnp.asarray(cert),
        jnp.asarray(om_g), jnp.asarray(om_rb), cfa, s,
    )
    kw = dict(radius=1, residual_bound=0.5, k_max=1.0, phase_output=True,
              order=1, prune_exp=3.0)
    full = merge_burst_raw_planes(*args, moment_slots=9, **kw)
    compact = merge_burst_raw_planes(*args, moment_slots=4, **kw)
    assert len(compact) == 4
    # the compact path folds the tap index as a scalar onto the m00
    # reduce (sum dy*wc = s(ky*sum wc - sum rho*wc)) — algebraically
    # identical, so only reassociation-level fp differences remain
    for i, k in enumerate((0, 1, 2, 6)):
        np.testing.assert_allclose(np.asarray(compact[i]),
                                   np.asarray(full[k]),
                                   rtol=1e-4, atol=1e-5)


def test_solve_plugin_exact_on_linear_field(rng):
    """On a spatially-LINEAR sample field with spatially-uniform sample
    placement, the pilot inherits the true gradient (it is the linear
    field shifted by a constant centroid offset), so ONE plugin
    iteration removes the centroid bias exactly — the same analytic
    property the exact order-1 solve has (test above), reached without
    fitting the gradient."""
    from multi_frame_super_resolution_tpu.models.merge import (
        grad_image,
        solve_plugin,
    )

    h, w, n = 12, 13, 9
    gy, gx = 0.7, -0.4
    yy = np.arange(h, dtype=np.float64)[:, None, None]
    xx = np.arange(w, dtype=np.float64)[None, :, None]
    c = 0.3 + gy * yy + gx * xx + np.zeros((h, w, 3))
    # per-sample displacement/weight constant across pixels (so the
    # centroid field is constant and the pilot stays linear)
    dys = rng.normal(0.4, 1.0, n)
    dxs = rng.normal(-0.3, 1.0, n)
    ws = rng.random(n) + 0.1
    m = [np.zeros((h, w, 3)) for _ in range(4)]
    for i in range(n):
        v = c + gy * dys[i] + gx * dxs[i]
        m[0] += ws[i]
        m[1] += ws[i] * dys[i]
        m[2] += ws[i] * dxs[i]
        m[3] += ws[i] * v
    est, m00 = solve_plugin(
        tuple(jnp.asarray(x, jnp.float32) for x in m), grad_image, iters=1
    )
    # interior only: the gradient's edge clamp breaks linearity at the
    # 1-px border
    np.testing.assert_allclose(
        np.asarray(est)[1:-1, 1:-1], c[1:-1, 1:-1], rtol=2e-4, atol=2e-4
    )
    centroid_bias = np.abs(np.asarray(m[3]) / np.asarray(m[0]) - c).mean()
    assert centroid_bias > 0.1  # the order-0 estimate IS biased here


def test_grad_phases_matches_grad_image(rng):
    """Phase-domain central differences == image-domain central
    differences of the interleaved image (interior; the edge clamps
    replicate whole phase blocks vs single pixels at the border)."""
    from multi_frame_super_resolution_tpu.models.fast_merge import grad_phases
    from multi_frame_super_resolution_tpu.models.merge import grad_image

    n, c, hh, hw = 4, 3, 6, 7
    x = rng.random((n, n, c, hh, hw)).astype(np.float32)
    gy_p, gx_p = grad_phases(jnp.asarray(x))
    # interleave (n, n, C, hh, hw) -> (n*hh, n*hw, C)
    img = np.transpose(x, (3, 0, 4, 1, 2)).reshape(n * hh, n * hw, c)
    gy_i, gx_i = grad_image(jnp.asarray(img))

    def interleave(p):
        return np.transpose(np.asarray(p), (3, 0, 4, 1, 2)).reshape(
            n * hh, n * hw, c
        )

    np.testing.assert_allclose(
        interleave(gy_p)[1:-1, 1:-1], np.asarray(gy_i)[1:-1, 1:-1],
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        interleave(gx_p)[1:-1, 1:-1], np.asarray(gx_i)[1:-1, 1:-1],
        rtol=1e-6, atol=1e-6,
    )


def test_centroid_block_exact_on_uniform_flow(rng):
    """centroid_block evaluates the centroid moments at the BLOCK-CENTER
    flow; when the residual field is spatially uniform per frame, the
    parity interpolation is a no-op (a shift of a constant field is the
    same field), so the block-flow and parity-flow centroids must agree
    exactly up to fp reassociation."""
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        merge_burst_raw_planes,
    )

    f, hh, hw, s = 3, 8, 10, 2
    cfa = [[1, 0], [2, 1]]
    planes = rng.random((f, 2, 2, hh, hw)).astype(np.float32)
    residual = np.broadcast_to(
        rng.normal(0, 0.4, (f, 1, 1, 2)), (f, hh, hw, 2)
    ).astype(np.float32)
    cert = rng.random((f, hh, hw, 3)).astype(np.float32)
    om_g = (rng.random((hh, hw, 3)) * 0.5 + 0.5).astype(np.float32)
    om_g[..., 2] = 0.1
    args = (
        jnp.asarray(planes), jnp.asarray(residual), jnp.asarray(cert),
        jnp.asarray(om_g), jnp.asarray(om_g * 0.8), cfa, s,
    )
    kw = dict(radius=1, residual_bound=0.5, k_max=1.0, phase_output=True,
              order=1, prune_exp=3.0, moment_slots=4)
    parity = merge_burst_raw_planes(*args, **kw)
    block = merge_burst_raw_planes(*args, centroid_block=True, **kw)
    for i in range(4):
        np.testing.assert_allclose(np.asarray(block[i]),
                                   np.asarray(parity[i]),
                                   rtol=1e-4, atol=1e-5)


def test_centroid_certless_matches_block_at_unit_cert(rng):
    """With certainty == 1 the certless shared centroid (centroid_cert=
    False) is algebraically identical to the per-cell block-center
    centroid: cy = clip(m01/m00), cx = clip(m02/m00). m00/b0 must be
    untouched; slots 1/2 hold the precomputed clipped ratios."""
    from multi_frame_super_resolution_tpu.models.fast_merge import (
        merge_burst_raw_planes,
    )

    f, hh, hw, s = 3, 8, 10, 2
    cfa = [[1, 0], [2, 1]]
    planes = rng.random((f, 2, 2, hh, hw)).astype(np.float32)
    residual = rng.normal(0, 0.3, (f, hh, hw, 2)).astype(np.float32)
    cert = np.ones((f, hh, hw, 3), np.float32)
    om_g = (rng.random((hh, hw, 3)) * 0.5 + 0.5).astype(np.float32)
    om_g[..., 2] = 0.1
    args = (
        jnp.asarray(planes), jnp.asarray(residual), jnp.asarray(cert),
        jnp.asarray(om_g), jnp.asarray(om_g * 0.8), cfa, s,
    )
    kw = dict(radius=1, residual_bound=0.5, k_max=1.0, phase_output=True,
              order=1, prune_exp=3.0, moment_slots=4)
    block = merge_burst_raw_planes(*args, centroid_block=True, **kw)
    certless = merge_burst_raw_planes(*args, centroid_cert=False, **kw)
    m00, m01, m02 = block[0], block[1], block[2]
    inv = np.where(
        np.asarray(m00) > 1e-8, 1.0 / np.maximum(np.asarray(m00), 1e-8), 0.0
    )
    np.testing.assert_allclose(
        np.asarray(certless[0]), np.asarray(m00), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(certless[3]), np.asarray(block[3]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(certless[1]),
        np.clip(np.asarray(m01) * inv, -2.0, 2.0),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(certless[2]),
        np.clip(np.asarray(m02) * inv, -2.0, 2.0),
        rtol=1e-4, atol=1e-5,
    )

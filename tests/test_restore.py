"""Unit oracles for the post-merge restoration filter (ops/restore.py).

The polyphase form must equal interleave -> direct FIR -> de-interleave
(it is what the fast pipelines fuse before their single interleave),
and the direct form must match scipy's convolution. Ref: the output
sharpening stage of the reference app (sharpenImg2,
multi_frame_sr.cpp:207-209) that this filter replaces, calibrated.
"""

import jax.numpy as jnp
import numpy as np


def test_restore_phases_matches_direct(rng):
    from multi_frame_super_resolution_tpu.ops.restore import (
        restore_image,
        restore_phases,
    )

    for n in (2, 4):
        planes = jnp.asarray(rng.random((n, n, 3, 12, 16)), jnp.float32)
        img = jnp.transpose(planes, (3, 0, 4, 1, 2)).reshape(
            n * 12, n * 16, 3
        )
        ref = np.asarray(restore_image(img))
        outp = restore_phases(planes)
        out = np.asarray(
            jnp.transpose(outp, (3, 0, 4, 1, 2)).reshape(n * 12, n * 16, 3)
        )
        m = 8  # border: edge clamp acts per phase plane in the polyphase form
        np.testing.assert_allclose(
            out[m:-m, m:-m], ref[m:-m, m:-m], atol=1e-6
        )


def test_restore_image_matches_scipy(rng):
    from scipy.signal import convolve2d

    from multi_frame_super_resolution_tpu.ops.restore import (
        RESTORE_KERNEL,
        restore_image,
    )

    img = rng.random((24, 32)).astype(np.float32)
    out = np.asarray(restore_image(jnp.asarray(img)))
    ref = convolve2d(img, RESTORE_KERNEL, mode="same", boundary="symm")
    m = 4
    np.testing.assert_allclose(out[m:-m, m:-m], ref[m:-m, m:-m], atol=1e-5)


def test_restore_kernel_dc_unity():
    from multi_frame_super_resolution_tpu.ops.restore import RESTORE_KERNEL

    # flat fields pass through exactly (unit DC gain)
    np.testing.assert_allclose(RESTORE_KERNEL.sum(), 1.0, atol=1e-5)


def test_temporal_noise_stat_compensates_subpixel(rng):
    """A clean burst misregistered by a known subpixel residual must
    measure near-zero noise once the residual is compensated; the
    uncompensated statistic reads residual * gradient instead."""
    from multi_frame_super_resolution_tpu.ops.restore import (
        temporal_noise_stat,
    )

    h, w = 96, 128
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (0.5 + 0.3 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).astype(np.float32)
    dx = 0.4
    shifted = np.empty_like(img)
    shifted[:, 1:] = (1 - dx) * img[:, 1:] + dx * img[:, :-1]
    shifted[:, 0] = img[:, 0]
    gray = jnp.asarray(np.stack([img, shifted]))
    res = np.zeros((1, h, w, 2), np.float32)
    # frame(x + flow) ~= ref(x) convention: shifted(x) = img(x - dx), so
    # shifted(x + dx) = img(x) and the residual flow is +dx
    res[..., 1] = dx
    comp = float(temporal_noise_stat(gray, residual=jnp.asarray(res)))
    raw = float(temporal_noise_stat(gray))
    assert raw > 5e-3, raw
    assert comp < raw / 3.0, (comp, raw)


def test_temporal_noise_stat_reads_noise_floor(rng):
    """Registered frames differing only by iid noise: the statistic must
    scale with the noise level (flat-region median of |N(0, sqrt(2))*s|
    ~ 0.95 s)."""
    from multi_frame_super_resolution_tpu.ops.restore import (
        temporal_noise_stat,
    )

    base = rng.random((96, 128)).astype(np.float32) * 0.1 + 0.4
    lo = base + rng.normal(0, 0.005, base.shape).astype(np.float32)
    hi = base + rng.normal(0, 0.02, base.shape).astype(np.float32)
    s_lo = float(temporal_noise_stat(jnp.asarray(np.stack([base, lo]))))
    s_hi = float(temporal_noise_stat(jnp.asarray(np.stack([base, hi]))))
    assert s_hi > 2.0 * s_lo, (s_lo, s_hi)


def test_restore_gain_edges():
    from multi_frame_super_resolution_tpu.ops.restore import restore_gain

    assert float(restore_gain(jnp.asarray(0.001), 0.014, 0.020)) == 1.0
    assert float(restore_gain(jnp.asarray(0.5), 0.014, 0.020)) == 0.0
    mid = float(restore_gain(jnp.asarray(0.017), 0.014, 0.020))
    assert 0.4 < mid < 0.6, mid


def test_restore_phases_gain_is_exact_lerp(rng):
    """The gain kwarg fuses the noise-gate lerp into the restoration
    accumulation; it must equal (1-g)*x + g*restore(x) exactly (linear
    algebra reassociation only)."""
    from multi_frame_super_resolution_tpu.ops.restore import restore_phases

    x = jnp.asarray(rng.random((4, 4, 3, 12, 14)).astype(np.float32))
    g = jnp.asarray(0.37, jnp.float32)
    fused = restore_phases(x, gain=g)
    lerp = x + g * (restore_phases(x) - x)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(lerp), rtol=1e-5, atol=1e-6
    )

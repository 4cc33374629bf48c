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

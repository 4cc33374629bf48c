"""Image derivatives and the structure tensor.

Reference equivalents: ComputeDerivativesKernel / ComputeDerivatives2Kernel
(opticalFlow.cu:96-185) — 5-tap derivatives with taps (+-2 -> /12) — and
ComputeStructureTensor (kernel.cu:690-715).

Sign note: the reference's stencil computes f(+2) - 8f(+1) + 8f(-1) - f(-2)
which is the NEGATIVE of the standard 5-point derivative; we use the
standard sign (out = df/dx) and keep the Lucas-Kanade update self-
consistent with it (registration/lucas_kanade.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.ops.filters import _filter_axis


# correlation taps at offsets (-2, -1, 0, +1, +2): standard 5-point derivative
# (kept as numpy so importing the module never initializes a jax backend)
_D5 = np.asarray([1.0, -8.0, 0.0, 8.0, -1.0], np.float32) / 12.0


def derivative5_x(img: jnp.ndarray) -> jnp.ndarray:
    # banded-matmul lowering: single-channel 5-tap convs lower poorly on
    # TPU (lax.conv wants many channels for the MXU; ops.filters notes)
    return _filter_axis(img, _D5, 1, "replicate")


def derivative5_y(img: jnp.ndarray) -> jnp.ndarray:
    return _filter_axis(img, _D5, 0, "replicate")


def derivatives(img: jnp.ndarray):
    """(dx, dy) of a single image (ComputeDerivatives2Kernel)."""
    return derivative5_x(img), derivative5_y(img)


def derivatives_pair(source: jnp.ndarray, target: jnp.ndarray):
    """(Ix, Iy, It) averaged over both frames, It = source - target
    (ComputeDerivativesKernel, opticalFlow.cu:96-147)."""
    ix = 0.5 * (derivative5_x(source) + derivative5_x(target))
    iy = 0.5 * (derivative5_y(source) + derivative5_y(target))
    it = source - target
    return ix, iy, it


def structure_tensor(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel (dx^2, dy^2, dx*dy) stacked on the last axis
    (ComputeStructureTensor, kernel.cu:690-715)."""
    return jnp.stack([dx * dx, dy * dy, dx * dy], axis=-1)

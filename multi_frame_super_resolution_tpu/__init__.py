"""multi_frame_super_resolution_tpu — a TPU-native (JAX/XLA/Pallas/pjit)
framework for multi-frame burst super-resolution and image defogging.

Built from scratch with the capability surface of the CUDA reference
``zhongzisha/multi_frame_super_resolution`` (see SURVEY.md): burst
alignment + kernel-regression fusion (handheld SR), BTV-L1 multi-frame SR
with selectable dense optical flow, FFT phase-correlation / log-polar
registration, Bayer demosaicing, dark-channel and polarization defogging,
and warmup-then-measure benchmark harnesses — all as jittable XLA programs
with Pallas kernels on the hot paths and pjit/shard_map burst-batch
sharding across the device mesh.
"""

__version__ = "0.1.0"

from multi_frame_super_resolution_tpu import config  # noqa: F401

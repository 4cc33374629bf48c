from multi_frame_super_resolution_tpu.utils.metrics import mse, psnr, ssim
from multi_frame_super_resolution_tpu.utils.timing import (
    BenchmarkResult,
    Timer,
    measure,
)

__all__ = ["mse", "psnr", "ssim", "BenchmarkResult", "Timer", "measure"]

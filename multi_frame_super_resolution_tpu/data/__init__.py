from multi_frame_super_resolution_tpu.data.datasets import (
    DATASETS,
    burst_paths,
    load_burst,
    mosaic_rggb,
    synthetic_burst,
)
from multi_frame_super_resolution_tpu.data.io import (
    imread,
    imread_gray,
    imread_u16,
    imwrite,
)

__all__ = [
    "DATASETS",
    "burst_paths",
    "load_burst",
    "mosaic_rggb",
    "synthetic_burst",
    "imread",
    "imread_gray",
    "imread_u16",
    "imwrite",
]

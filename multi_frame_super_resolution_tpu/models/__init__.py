from multi_frame_super_resolution_tpu.models.handheld import (
    handheld_superres,
    handheld_superres_raw,
)
from multi_frame_super_resolution_tpu.models.merge import (
    apply_weighting,
    kernel_params,
    merge_burst_raw,
    merge_burst_rgb,
    smoothed_structure_tensor,
)
from multi_frame_super_resolution_tpu.models.robustness import robustness_mask

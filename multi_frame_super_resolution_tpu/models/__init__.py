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
from multi_frame_super_resolution_tpu.models.btvl1 import btvl1_superres, btvl1_video
from multi_frame_super_resolution_tpu.models.defog import (
    dark_channel,
    dark_channel_defog,
    polar_defog,
    stokes_synthesis,
)
from multi_frame_super_resolution_tpu.models.robustness import robustness_mask

from multi_frame_super_resolution_tpu.registration.align import (
    align_burst,
    align_pair,
    build_pyramid,
    flow_from_tile_shifts,
)
from multi_frame_super_resolution_tpu.registration.global_shift import (
    design_matrix,
    measurement_pairs,
    shifts_to_reference,
    solve_consistent_shifts,
)
from multi_frame_super_resolution_tpu.registration.logpolar import (
    SimilarityTransform,
    log_polar_maps,
    log_polar_params,
    register_rotation_scale,
    register_similarity,
    register_translation,
    to_log_polar,
)
from multi_frame_super_resolution_tpu.registration.farneback import (
    farneback_flow,
    poly_expansion,
)
from multi_frame_super_resolution_tpu.registration.lucas_kanade import (
    lk_refine,
    lk_step,
    pyrlk_flow,
)
from multi_frame_super_resolution_tpu.registration.optical_flow import (
    available_backends,
    create_optical_flow,
)
from multi_frame_super_resolution_tpu.registration.brox import brox_flow
from multi_frame_super_resolution_tpu.registration.tvl1 import tvl1_flow
from multi_frame_super_resolution_tpu.registration.phase_correlation import (
    correlation_surface,
    phase_correlate,
)
from multi_frame_super_resolution_tpu.registration.subpixel import (
    quadratic_subpixel_max,
    quadratic_subpixel_min,
)
from multi_frame_super_resolution_tpu.registration.tiles import (
    extract_ref_tiles,
    extract_search_windows,
    find_min_shift,
    ssd_surface,
    tile_counts,
    upsample_shift_field,
)

from multi_frame_super_resolution_tpu.parallel.mesh import (
    burst_batch_sharding,
    data_model_mesh,
    make_mesh,
    replicated,
    shard_batch,
)
from multi_frame_super_resolution_tpu.parallel.spatial import (
    handheld_superres_raw_sharded,
    handheld_superres_sharded,
    pipeline_halo,
    sharded_rows,
    spatial_map,
)

from crop2seg_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, data_parallel_step, data_parallel_eval,
)

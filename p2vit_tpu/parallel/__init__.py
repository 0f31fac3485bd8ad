from .mesh import (
    data_parallel_eval,
    make_mesh,
    param_shardings,
    shard_batch,
    sharded_minmax_stats,
)

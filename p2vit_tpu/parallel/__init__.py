from .mesh import (
    data_parallel_eval,
    make_mesh,
    param_shardings,
    shard_batch,
    sharded_minmax_stats,
)

# pipeline (GPipe PP) and tensor (megatron TP/SP serving) are deliberately
# NOT imported here: they pull the serving/ops stack (Pallas kernels) into
# what is otherwise a lightweight mesh-utilities import. Use
# `from p2vit_tpu.parallel import pipeline` / `import tensor` directly.

from spacap3d_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)
from spacap3d_tpu.parallel.tp import (  # noqa: F401
    count_sharded,
    make_tp_mesh,
    shard_params,
    tp_degree,
    tp_param_specs,
)

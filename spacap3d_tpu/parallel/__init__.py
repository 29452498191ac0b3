from spacap3d_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

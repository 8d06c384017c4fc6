from semisupervisedobjectdetection_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    replicate_sharding,
    shard_batch,
)

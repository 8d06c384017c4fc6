from semisupervisedobjectdetection_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    fsdp_shard,
    fsdp_spec,
    get_mesh,
    replicate,
    replicate_sharding,
    shard_batch,
)

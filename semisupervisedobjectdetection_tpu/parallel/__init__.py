from semisupervisedobjectdetection_tpu.parallel.collective import (  # noqa: F401,E501
    all_gather_matmul,
    matmul_reduce_scatter,
    mixffn_collective,
    sequence_parallel_ffn,
)
from semisupervisedobjectdetection_tpu.parallel.pipeline_ema import (  # noqa: F401,E501
    DataParallelEmaPipelinedTrainer,
    EmaPipelinedTrainer,
)
from semisupervisedobjectdetection_tpu.parallel.pipeline_train import (  # noqa: F401,E501
    DataParallelPipelinedTrainer,
    PipelinedTrainer,
)
from semisupervisedobjectdetection_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    fsdp_shard,
    fsdp_spec,
    get_mesh,
    replicate,
    replicate_sharding,
    shard_batch,
)

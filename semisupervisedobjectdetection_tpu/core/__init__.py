from semisupervisedobjectdetection_tpu.core.config import (  # noqa: F401
    DataConfig,
    MiTConfig,
    TrainConfig,
    MIT_VARIANTS,
    mit_b0,
    mit_b5,
    product_grid,
)

from semisupervisedobjectdetection_tpu.train.state import (  # noqa: F401
    TrainState,
    frozen_stage_predicate,
    make_transform,
    trainable_mask_from,
)

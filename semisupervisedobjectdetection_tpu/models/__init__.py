from semisupervisedobjectdetection_tpu.models.segformer import (  # noqa: F401
    DecodeHead,
    MiTEncoder,
    SegFormer,
    predict_masks,
    upsample_bilinear,
)

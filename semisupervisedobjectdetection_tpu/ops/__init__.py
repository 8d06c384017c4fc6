from semisupervisedobjectdetection_tpu.ops.sr_attention import (  # noqa: F401
    sr_attention,
)

from semisupervisedobjectdetection_tpu.utils.logging import (  # noqa: F401
    MetricLogger,
    profile_trace,
)

from semisupervisedobjectdetection_tpu.eval.metrics import (  # noqa: F401
    binary_miou,
    dice_score,
    per_image_miou,
    pixel_accuracy,
    segmentation_metrics,
)

"""TPU-native semi-supervised archaeological-site segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JiaqiLi404/SemiSupervisedObjectDetection (reference mounted at /root/reference):
supervised SegFormer (MiT) fine-tuning with prompt/CLS-token extensions,
autoencoder pretraining, prompt-tuning transfer learning, teacher-student
semi-supervised training with confidence-thresholded pseudo-labels, few-shot
domain prompting, CNN segmentation baselines and a DINOv2-style ViT pipeline.

Design is TPU-first: NHWC layouts, bf16 compute with fp32 params, one jitted
train step per workload over a `jax.sharding.Mesh`, Pallas kernels for the
sequence-reduction attention hot path, and Orbax checkpointing.
"""

__version__ = "0.1.0"

from semisupervisedobjectdetection_tpu.core.config import (  # noqa: F401
    DataConfig,
    MiTConfig,
    TrainConfig,
)

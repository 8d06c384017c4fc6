#!/usr/bin/env bash
# End-to-end smoke of every workload on synthetic data (one TPU chip or
# CPU). Each command was verified individually on TPU v5e; the whole
# script takes ~25 min (compiles dominate).
set -euo pipefail
cd "$(dirname "$0")/.."

COMMON="--synthetic --synthetic-n 12 --variant b0 --img-size 128 \
        --batch-size 4 --epochs 1 --dtype float32 --checkpoint-dir /tmp/sso_ck"

python -m semisupervisedobjectdetection_tpu.cli.supervised $COMMON
python -m semisupervisedobjectdetection_tpu.cli.autoencoder $COMMON
python -m semisupervisedobjectdetection_tpu.cli.transfer $COMMON \
    --frozen 0,1 --prompt-tokens 4,4,4,4
python -m semisupervisedobjectdetection_tpu.cli.teacher_student $COMMON
python -m semisupervisedobjectdetection_tpu.cli.fewshot $COMMON \
    --mode ae --iterations 2
python -m semisupervisedobjectdetection_tpu.cli.baseline_cnn $COMMON \
    --archs deeplabv3p --encoder-depths 2,2,2,2
python -m semisupervisedobjectdetection_tpu.cli.vit_pipeline --synthetic \
    --synthetic-n 8 --img-size 126 --batch-size 4 --epochs 1 \
    --dtype float32 --checkpoint-dir /tmp/sso_ck --mode seg --vit small \
    --vit-depth 2
python bench.py --quick
echo "ALL WORKLOADS OK"

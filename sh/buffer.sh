#!/bin/bash
# mirror of reference sh/baseline/buffer.sh: bash buffer.sh DATASET
DATA=${1:-miniUCF101}
python -m video_distillation_tpu.drivers.buffer --dataset ${DATA} \
  --buffer_path ./buffers/${DATA} --lr_teacher 0.01 --num_experts 30

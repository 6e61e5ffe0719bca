#!/bin/bash
# mirror of reference sh/baseline/DM.sh: bash DM.sh DATASET LR IPC
DATA=${1:-miniUCF101}; LR=${2:-30}; IPC=${3:-1}
python -m video_distillation_tpu.drivers.distill_baseline --preset DM \
  --dataset ${DATA} --ipc ${IPC} --lr_img ${LR}

#!/bin/bash
# mirror of reference sh/baseline/MTT.sh: bash MTT.sh DATASET LR IPC
DATA=${1:-miniUCF101}; LR=${2:-1e5}; IPC=${3:-1}
python -m video_distillation_tpu.drivers.distill_baseline --preset MTT \
  --dataset ${DATA} --ipc ${IPC} --lr_img ${LR} --buffer_path ./buffers/${DATA}

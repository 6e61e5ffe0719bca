#!/bin/bash
# mirror of reference sh/s2d/s2d_DM_ms.sh (ipc=1)
python -m video_distillation_tpu.drivers.distill_s2d --preset s2d_DM_ms "$@"

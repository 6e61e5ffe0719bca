#!/bin/bash
# mirror of reference sh/s2d/s2d_DM_ms_5.sh (ipc=5: vpc 10/spc 10/dpc 10)
python -m video_distillation_tpu.drivers.distill_s2d --preset s2d_DM_ms_5 "$@"

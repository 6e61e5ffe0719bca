#!/bin/bash
# mirror of reference sh/s2d/s2d_MTT_ms_K400.sh (K400/SSv2: frames 8, top5)
python -m video_distillation_tpu.drivers.distill_s2d --preset s2d_MTT_ms_K400 "$@"

from .checkpoint import (latest_step, restore_state, save_artifact,
                         save_state)
from .logging import MetricLogger, StepTimer
from .profiling import annotate, timed, trace

__all__ = ["latest_step", "restore_state", "save_artifact", "save_state",
           "MetricLogger", "StepTimer", "annotate", "timed", "trace"]

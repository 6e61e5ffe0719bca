from .buffer import generate_buffers, load_buffers, train_expert
from .dm import (DMState, init_s2d_momentum, init_synthetic_raw,
                 make_dm_trainer, make_s2d_dm_trainer)
from .evaluate import EvalConfig, EvalResult, evaluate_many, evaluate_synset
from .mtt import (ExpertSampler, TrajectoryBuffer, flat_param_template,
                  make_batch_plan)
from .s2d import (S2DConfig, compose_synthetic, distill_slots, eval_slots,
                  hallucinate, init_s2d_state)

__all__ = [
    "generate_buffers", "load_buffers", "train_expert", "DMState",
    "init_s2d_momentum", "init_synthetic_raw", "make_dm_trainer",
    "make_s2d_dm_trainer", "EvalConfig", "EvalResult", "evaluate_many",
    "evaluate_synset", "ExpertSampler", "TrajectoryBuffer",
    "flat_param_template", "make_batch_plan", "S2DConfig",
    "compose_synthetic", "distill_slots", "eval_slots", "hallucinate",
    "init_s2d_state",
]

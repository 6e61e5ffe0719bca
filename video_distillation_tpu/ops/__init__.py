from .losses import (cross_entropy, dm_loss, lb_margin_th, match_loss, mse,
                     mtt_param_loss, soft_cross_entropy)
from .metrics import per_class_correct, topk_correct

__all__ = [
    "cross_entropy", "dm_loss", "lb_margin_th", "match_loss", "mse",
    "mtt_param_loss", "soft_cross_entropy", "per_class_correct",
    "topk_correct",
]

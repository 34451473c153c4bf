from .cross_entropy import (
    softmax_cross_entropy,
    weighted_softmax_ce_loss,
    binary_ce_with_logits,
)
from .dice import naive_dice_loss
from .grounding import grounding_loss
from .criterion import CriterionConfig, compute_losses

__all__ = [
    "softmax_cross_entropy",
    "weighted_softmax_ce_loss",
    "binary_ce_with_logits",
    "naive_dice_loss",
    "grounding_loss",
    "CriterionConfig",
    "compute_losses",
]

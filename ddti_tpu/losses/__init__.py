from .losses import (  # noqa: F401
    LossTerms,
    bce_with_logits_loss,
    boundary_loss,
    composite_loss,
    dice_loss,
    focal_tversky_loss,
    weighted_loss,
)

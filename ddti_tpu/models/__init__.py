from .zoo import (  # noqa: F401
    MODEL_REGISTRY,
    ASPPUNet,
    AttentionUNet,
    ImprovedVNet,
    ResUNet,
    TransUNet,
    UNet,
    VNet2D,
    create_model,
)
from . import blocks  # noqa: F401

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
from .legacy import LegacyUNet, TripleBranchImprovedVNet  # noqa: F401
from . import blocks  # noqa: F401

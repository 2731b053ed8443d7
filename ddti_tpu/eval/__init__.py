from .contours import find_contours  # noqa: F401
from .metrics import (  # noqa: F401
    ConfusionCounts,
    calculate_acc,
    calculate_iou,
    calculate_precision_recall_f1,
    confusion_counts,
    epoch_metrics_from_counts,
    metrics_from_counts,
)
from .sliding_window import (  # noqa: F401
    sliding_window_logits,
    sliding_window_predict,
)
from .tta import tta_logits, tta_probs  # noqa: F401
from .visualize import save_boundary_grids  # noqa: F401
from .confusion import save_confusion_matrix  # noqa: F401

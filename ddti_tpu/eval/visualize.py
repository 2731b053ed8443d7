"""Contour-overlay test visualization.

Reproduces /root/reference/utils/trainer.py:264-299: per 20 test images a
5x4 matplotlib grid, ground-truth contours in blue, predicted contours in
red, saved as ``test_boundaries_<k>.png`` in the result directory.
"""

from __future__ import annotations

import os

import numpy as np

from .contours import find_contours


def save_boundary_grids(images: np.ndarray, masks: np.ndarray,
                        preds: np.ndarray, result_dir: str,
                        per_fig: int = 20) -> list[str]:
    """images/masks/preds: (N, H, W) arrays (images float [0,1], masks and
    preds binary). Returns the written file paths."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    total = images.shape[0]
    # grid derived from per_fig (4 columns like the reference's 5x4 at the
    # default 20); a hardcoded 5x4 would IndexError for per_fig > 20
    ncols = 4
    nrows = max(-(-per_fig // ncols), 1)
    paths = []
    for batch_start in range(0, total, per_fig):
        n = min(per_fig, total - batch_start)
        fig, axes = plt.subplots(nrows, ncols, figsize=(4 * ncols, 4 * nrows),
                                 squeeze=False)
        axes = axes.flatten()
        for i in range(n):
            idx = batch_start + i
            ax = axes[i]
            ax.imshow(images[idx], cmap="gray")
            for contour in find_contours(masks[idx], 0.5):
                ax.plot(contour[:, 1], contour[:, 0], color="blue",
                        linewidth=1)
            for contour in find_contours(preds[idx], 0.5):
                ax.plot(contour[:, 1], contour[:, 0], color="red",
                        linewidth=1)
            ax.axis("off")
        for j in range(n, len(axes)):
            axes[j].axis("off")
        plt.tight_layout()
        path = os.path.join(result_dir,
                            f"test_boundaries_{batch_start // per_fig}.png")
        plt.savefig(path)
        plt.close(fig)
        paths.append(path)
    return paths

"""Flip test-time augmentation (TTA).

Beyond-reference capability (the torch reference predicts each test image
once, /root/reference/utils/trainer.py:214-221): average the model's
sigmoid probabilities over the four axis-flip variants of each image
(identity, horizontal, vertical, both) and fold the ensemble back into a
single logit map. The standard dihedral-subgroup ensemble used by
nnU-Net-style medical segmentation pipelines — flips are exact
symmetries of the ultrasound geometry, unlike 90-degree rotations, which
would change the probe-axis orientation.

TPU-first shape: the flip loop is a static Python loop over ``jnp.flip``
axes, so all four forward passes fuse into ONE XLA program — no host
round trips, no dynamic shapes, cost exactly 4x a single forward.
Downstream consumers (thresholding, confusion counts, serving export,
sliding-window blending) keep their logits-in interface via the logit
transform log(p / (1-p)).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

# NHWC: axis 1 flips vertically (H), axis 2 horizontally (W).
FLIP_AXES = ((), (2,), (1,), (1, 2))


def tta_probs(forward: Callable[[jnp.ndarray], jnp.ndarray],
              images: jnp.ndarray) -> jnp.ndarray:
    """Mean sigmoid probability over the 4 flip variants.

    ``forward(images_nhwc) -> logits_nhwc`` is the model's logit map;
    outputs are un-flipped back to the input frame before averaging.
    Returns float32 probabilities in [0, 1].
    """
    total = None
    for axes in FLIP_AXES:
        x = jnp.flip(images, axes) if axes else images
        p = jax.nn.sigmoid(forward(x).astype(jnp.float32))
        p = jnp.flip(p, axes) if axes else p
        total = p if total is None else total + p
    return total / len(FLIP_AXES)


def tta_logits(forward: Callable[[jnp.ndarray], jnp.ndarray],
               images: jnp.ndarray) -> jnp.ndarray:
    """Flip-TTA ensemble expressed as a logit map: logit(mean-prob).

    sigmoid(tta_logits(...)) == tta_probs(...) up to a +/-16.6 logit
    clamp (p clipped to [1e-7, 1-1e-7]), so any consumer that thresholds
    sigmoid(logits) (confusion counts, serve_body) gets the ensembled
    prediction unchanged. The clamp keeps saturated probabilities FINITE:
    the sliding-window blender computes weighted averages of these
    logits, and an infinity there would override every overlapping tile
    (and inf - inf across tiles is NaN).
    """
    eps = jnp.float32(1e-7)
    p = jnp.clip(tta_probs(forward, images), eps, 1.0 - eps)
    return jnp.log(p) - jnp.log1p(-p)

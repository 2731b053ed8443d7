"""Serving export: serialize the trained model's inference function as a
StableHLO artifact (jax.export) — weights baked in, loadable without the
framework's Python model code. The deployment-path capability the torch
reference has no analogue for.

  blob = export_serving(model, params, batch_stats, batch, size)
  fn = load_serving(blob)          # fn(images_f32[N,H,W,C]) -> masks_u8
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import export as jax_export


def make_serve_fn(model, params: Any, batch_stats: Any,
                  threshold: float = 0.5):
    """Closed-over inference function: float [0,1] images -> uint8 masks."""

    variables = {"params": params, "batch_stats": batch_stats}

    def serve(images):
        out = model.apply(variables, images, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        return (probs > threshold).astype(jnp.uint8)

    return serve


def export_serving(model, params: Any, batch_stats: Any, batch: int,
                   size: int, in_channels: int = 1,
                   threshold: float = 0.5, fold_bn: bool = False) -> bytes:
    """Serialize the inference function (weights baked in) for the input
    shape (batch, size, size, in_channels). ``fold_bn=True`` folds
    BatchNorm into the conv kernels first (train/fold_bn.py) so the
    exported graph carries no normalization arithmetic."""
    if fold_bn:
        from ddti_tpu.train.fold_bn import fold_batchnorm
        params, batch_stats = fold_batchnorm(model, params, batch_stats)
    serve = make_serve_fn(model, params, batch_stats, threshold)
    spec = jax.ShapeDtypeStruct((batch, size, size, in_channels),
                                jnp.float32)
    exported = jax_export.export(jax.jit(serve))(spec)
    return exported.serialize()


def load_serving(blob: bytes):
    """Rehydrate a serialized artifact into a callable."""
    exported = jax_export.deserialize(blob)
    return exported.call


def save_serving(path: str, model, params, batch_stats, batch: int,
                 size: int, **kw) -> None:
    with open(path, "wb") as f:
        f.write(export_serving(model, params, batch_stats, batch, size,
                               **kw))


def load_serving_file(path: str):
    with open(path, "rb") as f:
        return load_serving(f.read())

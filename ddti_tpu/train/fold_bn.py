"""Inference-time BatchNorm folding.

Folds every Conv -> BatchNorm pair into the conv kernel so the served graph
does no normalization arithmetic at all: the conv kernel absorbs
``gamma / sqrt(var + eps)`` per output channel and the BatchNorm collapses
to a pure per-channel bias add (scale=1, mean=0, var=1-eps), which XLA
fuses into the conv epilogue. Checkpoint/param structure is unchanged, so
folded weights remain loadable by the unmodified model and exportable via
``train/export.py``.

The torch reference (/root/reference) has no deployment path at all; this
is part of the serving capability layer on top of its Trainer.test().

Pairing is by the zoo's naming convention (``convN``/``bnN``,
``<name>``/``<name>_bn``). The one model family where that adjacency does
NOT hold is LegacyUNet's Conv->ReLU->BN blocks (models/legacy.py:37-51) —
folding through a ReLU is invalid — so ``fold_batchnorm`` numerically
validates the folded model against the original on a tiny example and
raises if they diverge, rather than silently corrupting weights.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ddti_tpu.models.blocks import BN_EPS


def _bn_partner(name: str) -> str | None:
    """Conv sibling name for a BatchNorm child name, per zoo convention."""
    if name.startswith("bn") and name[2:].isdigit():
        return "conv" + name[2:]
    if name.endswith("_bn"):
        return name[: -len("_bn")]
    return None


def _classify(params: dict, stats: dict, name: str) -> tuple[str, str | None]:
    """The ONE pairing predicate shared by ``_fold_tree`` and
    ``fold_pairs`` (they must never drift apart — a disagreement would
    either skip the numeric misfold validation for pairs that get folded,
    or report folds that never happen). Returns one of:
      ("fold", conv_name)  — a BN whose partner conv exists and is 4-D
      ("skip", None)       — a BN with no foldable partner (left intact)
      ("recurse", None)    — not a BN; descend into the submodule
    """
    child = params[name]
    is_bn = ("scale" in child and "bias" in child
             and isinstance(stats.get(name), dict)
             and "mean" in stats[name] and "var" in stats[name])
    if not is_bn:
        return "recurse", None
    conv_name = _bn_partner(name)
    conv = params.get(conv_name) if conv_name else None
    if conv is None or "kernel" not in conv or np.ndim(conv["kernel"]) != 4:
        return "skip", None  # unpaired BN — leave untouched (still correct)
    return "fold", conv_name


def _fold_tree(params: dict, stats: dict, eps: float, folded: list) -> None:
    """Recursively fold conv->bn pairs in one module dict, in place."""
    for name in list(params.keys()):
        child = params[name]
        if not isinstance(child, dict):
            continue
        kind, conv_name = _classify(params, stats, name)
        if kind == "fold":
            conv = params[conv_name]
            gamma = jnp.asarray(child["scale"], jnp.float32)
            beta = jnp.asarray(child["bias"], jnp.float32)
            mean = jnp.asarray(stats[name]["mean"], jnp.float32)
            var = jnp.asarray(stats[name]["var"], jnp.float32)
            factor = gamma / jnp.sqrt(var + eps)  # per out-channel

            kernel = jnp.asarray(conv["kernel"], jnp.float32)
            conv["kernel"] = (kernel * factor).astype(conv["kernel"].dtype)
            bias = beta - mean * factor
            if "bias" in conv:  # conv bias rides through BN's affine map
                bias = bias + jnp.asarray(conv["bias"], jnp.float32) * factor
                conv["bias"] = jnp.zeros_like(conv["bias"])
            # BN becomes the identity-plus-bias: (x-0)/sqrt((1-eps)+eps)=x.
            child["scale"] = jnp.ones_like(child["scale"])
            child["bias"] = bias.astype(child["bias"].dtype)
            stats[name]["mean"] = jnp.zeros_like(stats[name]["mean"])
            stats[name]["var"] = jnp.full_like(stats[name]["var"], 1.0 - eps)
            folded.append(name)
        elif kind == "recurse":
            sub_stats = stats.get(name)
            _fold_tree(child, sub_stats if isinstance(sub_stats, dict) else {},
                       eps, folded)


def fold_pairs(params: Any, batch_stats: Any) -> list:
    """Names of the BN modules ``fold_batchnorm`` would fold — a
    structure-only walk (no math, no device work) over the SAME
    ``_classify`` predicate ``_fold_tree`` folds with, used to decide
    whether the numeric validation pass is needed at all."""

    def walk(p: dict, s: dict, out: list) -> None:
        for name, child in p.items():
            if not isinstance(child, dict):
                continue
            kind, _ = _classify(p, s, name)
            if kind == "fold":
                out.append(name)
            elif kind == "recurse":
                sub = s.get(name)
                walk(child, sub if isinstance(sub, dict) else {}, out)

    out: list = []
    walk(params, batch_stats, out)
    return out


def fold_batchnorm(model, params: Any, batch_stats: Any, *,
                   example: Any | None = None, eps: float = BN_EPS,
                   atol: float = 1e-3, rtol: float = 0.01):
    """Return ``(folded_params, folded_batch_stats)`` with every
    Conv->BatchNorm pair absorbed into the conv kernel.

    When ``example`` is given (or by default, a 1x32x32xC zeros+noise batch
    inferred from the model), the folded weights are validated against the
    originals in eval mode and a ``ValueError`` is raised on divergence —
    this rejects models whose BN does not directly follow its conv (e.g.
    LegacyUNet's Conv->ReLU->BN order).

    The validation pass runs under ``jax.default_matmul_precision
    ("highest")``: at the MXU's default (bf16-input) precision, folded vs.
    original weights legitimately differ by ~1e-3 on TPU from rounding
    alone, which would blur the line to a real misfold (~3-50% relative,
    measured on LegacyUNet); at highest precision rounding drops below
    1e-5 and the threshold ``atol + rtol * max|logit|`` separates cleanly.

    Everything stays ON DEVICE: the fold is one jitted tree->tree program
    and the validation one jitted two-forward program returning two
    scalars. The original implementation device_get the full param tree
    and re-dispatched per-conv ops eagerly — at flagship scale through the
    remote-dispatch tunnel (~20 MB/s, 30-50 ms/op) that cost ~50+ s where
    this costs ~2 s warm (the programs land in the persistent compile
    cache). Returns device arrays; callers needing host copies
    ``jax.device_get`` the (much smaller) result they actually use.
    """
    folded = fold_pairs(params, batch_stats)
    if not folded:
        return params, batch_stats

    def _fold(p, s):
        # jit unflattens fresh dict containers, so in-place edits by
        # _fold_tree cannot leak into the caller's trees
        _fold_tree(p, s, eps, [])
        return p, s

    fparams, fstats = jax.jit(_fold)(params, batch_stats)

    if model is not None:
        if example is None:
            c = int(getattr(model, "in_channels", 1))
            # models with a fixed input resolution (TransUNet's pos_emb
            # is sized for image_size/2^depth tokens) must be validated
            # at that resolution; everything else uses a small example
            side = int(getattr(model, "image_size", 0) or 32)
            example = jax.random.uniform(jax.random.PRNGKey(0),
                                         (1, side, side, c), jnp.float32)
        # validate in f32 even for bf16-compute models: the fold math acts
        # on the f32 master params, and bf16 activations would inflate
        # legitimate rounding past the misfold threshold
        vmodel = model
        if getattr(model, "dtype", jnp.float32) != jnp.float32:
            import dataclasses as _dc
            vmodel = _dc.replace(model, dtype=jnp.float32)

        def _verify(op, os_, fp, fs, ex):
            def logits(p, s):
                with jax.default_matmul_precision("highest"):
                    out = vmodel.apply({"params": p, "batch_stats": s}, ex,
                                       train=False)
                return (out[0] if isinstance(out, tuple) else out
                        ).astype(jnp.float32)

            want, got = logits(op, os_), logits(fp, fs)
            return jnp.max(jnp.abs(want - got)), jnp.max(jnp.abs(want))

        err_d, maxw_d = jax.jit(_verify)(params, batch_stats,
                                         fparams, fstats, example)
        err, tol = float(err_d), atol + rtol * float(maxw_d)
        if not np.isfinite(err) or err > tol:
            raise ValueError(
                f"BatchNorm folding changed the model output (max abs err "
                f"{err:.3e} > tol {tol:.3e}); this model's BN layers do not "
                f"directly follow their convs (e.g. LegacyUNet's "
                f"Conv->ReLU->BN order) and cannot be folded.")
    return fparams, fstats

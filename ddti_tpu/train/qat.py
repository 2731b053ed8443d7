"""Quantization-aware training (QAT) for the int8 serving path.

Post-training quantization (train/quantize.py) takes activation scales
from ONE calibration batch — fine for the easy synthetic task, fragile on
harder data where a single batch under-covers the activation range. QAT
closes that gap during training itself:

- every quantizable conv / decoder conv-transpose (the same module set
  train/quantize.py targets) runs its forward through **fake-quantization**:
  per-output-channel symmetric int8 weight rounding and per-tensor
  symmetric int8 activation rounding, straight-through estimator (STE)
  gradients, so the weights *learn* to sit well on the int8 grid;
- activation ranges are tracked as an **amax EMA** over the whole training
  run (``TrainState.qstats``, one f32 scalar per conv), replacing the
  single-batch calibration at export time.

Transfer to the deployed int8 graph is exact where it matters: the int8
export folds BatchNorm into the conv kernels, but folding multiplies each
OUTPUT channel by a constant — and per-output-channel symmetric
quantization is scale-invariant per channel (scale = amax/127 scales by
the same constant; round-half-even commutes with sign), so the weight
rounding pattern the model adapted to during QAT is the one it serves
with. Activation fake-quant sees the conv *inputs*, which are identical
tensors in the folded and unfolded eval graphs.

The torch reference (/root/reference) has no quantization of any kind;
this extends the serving capability built on top of its Trainer
(utils/trainer.py:206-299) with production int8 deployment quality.

Usage: ``--qat`` on the train CLI (optionally ``--qat_ema_decay``,
``--quant_min_channels``); export with ``--serving_dtype int8`` then uses
the learned ranges automatically (``quantize_serving(amax=...)``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .quantize import (
    _conv_geometry,
    _is_plain_convt,
    _is_quantizable,
    _pairs,
)


def fake_quant(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 fake-quantization with a clipped straight-through
    estimator: forward is ``clip(rint(x/s), -127, 127) * s``; the gradient
    passes through unchanged inside the representable range ``|x| <=
    127*s`` and is zero outside (the standard clipped-STE rule — values the
    int8 grid saturates should not keep growing). ``scale`` broadcasts
    (per-tensor scalar or per-channel vector); gradients do not flow into
    it (scales come from stop-gradient amax statistics)."""
    scale = lax.stop_gradient(scale)
    q = jnp.clip(jnp.rint(x / scale), -127.0, 127.0) * scale
    inside = jnp.abs(x) <= 127.0 * scale
    return jnp.where(inside, x + lax.stop_gradient(q - x),
                     lax.stop_gradient(q))


def _fq_conv(mod, x: jnp.ndarray, amax: jnp.ndarray) -> jnp.ndarray:
    """One conv/conv-transpose forward with fake-quantized weights and
    input, numerically mirroring the int8 serving graph's rounding
    (train/quantize.py:_quant_interceptor) while staying differentiable.
    Compute runs at the module's own dtype (bf16 under the standard
    policy) — same MXU path and cost class as the float forward."""
    kernel = mod.variables["params"]["kernel"].astype(jnp.float32)
    # per-output-channel weight scale, exactly build_quant_tree's rule
    sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
    sw = jnp.maximum(sw, 1e-12)
    wq = fake_quant(kernel, sw)
    sx = jnp.maximum(amax, 1e-12) / 127.0
    xq = fake_quant(x.astype(jnp.float32), sx)
    cd = mod.dtype or x.dtype
    xq, wq = xq.astype(cd), wq.astype(cd)
    if _is_plain_convt(mod):
        y = lax.conv_transpose(xq, wq, _pairs(mod.strides), mod.padding,
                               transpose_kernel=False)
    else:
        strides, padding, lhs_dil, rhs_dil = _conv_geometry(mod)
        y = lax.conv_general_dilated(
            xq, wq, strides, padding,
            lhs_dilation=lhs_dil, rhs_dilation=rhs_dil,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if mod.use_bias:
        y = y + mod.variables["params"]["bias"].astype(cd)
    return y.astype(mod.dtype or x.dtype)


def init_qstats(model, variables: dict, input_shape,
                min_channels: int = 0) -> dict:
    """The activation-range EMA tree: ``{"enc/conv1": f32 0.0, ...}`` —
    one scalar per quantizable conv (filtered by ``min_channels`` on
    ``max(cin, cout)``, the same mixed-precision rule as
    ``quantize_serving``). Keys are '/'-joined module paths (plain strings
    so the tree checkpoints cleanly through Orbax). Zero means
    "unobserved"; the first QAT step seeds each entry from its own batch
    amax. Traced abstractly (``jax.eval_shape``) — costs no compute."""
    if getattr(model, "remat", False):
        # nn.remat's inner trace would leak the path-collection side
        # channel; path discovery does not need checkpointing
        model = model.clone(remat=False)
    paths: dict = {}

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if _is_quantizable(mod) and context.method_name == "__call__":
            k = mod.variables["params"]["kernel"]
            if not min_channels or max(k.shape[2:]) >= min_channels:
                paths["/".join(mod.path)] = True
        return next_fun(*args, **kwargs)

    def run(v, x):
        with nn.intercept_methods(icpt):
            model.apply(v, x, train=False)
        return jnp.zeros(())

    jax.eval_shape(run, variables,
                   jax.ShapeDtypeStruct(tuple(input_shape), jnp.float32))
    return {p: jnp.zeros((), jnp.float32) for p in sorted(paths)}


def _flatten_qobs(tree, prefix=()) -> dict:
    """'qobs' collection tree -> {"enc/conv1": amax} with the same
    '/'-joined module-path keys as ``init_qstats``."""
    out: dict = {}
    for k, v in dict(tree).items():
        if k == "amax":
            out["/".join(prefix)] = v
        else:
            out.update(_flatten_qobs(v, prefix + (k,)))
    return out


def qat_apply(apply_fn, variables: dict, images, qstats: dict, **kwargs):
    """``apply_fn`` (``model.apply``) with every tracked conv fake-
    quantized. Returns ``(apply_result, observed)`` where ``observed`` maps
    each executed tracked path to this batch's input amax (stop-gradient
    f32 scalars) — feed to ``TrainState.update_qstats``. Convs whose path
    is not in ``qstats`` (min_channels-filtered) run the float path.

    Activation scales come from the EMA in ``qstats``; an unobserved entry
    (0.0, first step) falls back to the batch's own amax so step 1 is
    already sanely scaled.

    The observations ride a mutable ``qobs`` flax collection (one 'amax'
    variable per tracked conv), NOT a Python side dict: under ``remat``
    (nn.remat = lifted jax.checkpoint) the interceptor runs inside the
    checkpointed trace, and a side-dict write leaks tracers out of it
    (UnexpectedTracerError — found composing --qat with --remat, r5).
    Collections are threaded through lifted transforms by flax itself."""

    def icpt(next_fun, args, kwargs, context):
        mod = context.module
        if not (_is_quantizable(mod) and context.method_name == "__call__"):
            return next_fun(*args, **kwargs)
        path = "/".join(mod.path)
        if path not in qstats:
            return next_fun(*args, **kwargs)
        x = args[0]
        fresh = lax.stop_gradient(
            jnp.max(jnp.abs(x.astype(jnp.float32))))
        prev = mod.get_variable("qobs", "amax", jnp.zeros((), jnp.float32))
        mod.put_variable("qobs", "amax", jnp.maximum(prev, fresh))
        ema = qstats[path]
        return _fq_conv(mod, x, jnp.where(ema > 0, ema, fresh))

    mutable = kwargs.pop("mutable", [])
    mutable = ([mutable] if isinstance(mutable, str) else list(mutable or []))
    with nn.intercept_methods(icpt):
        out, updates = apply_fn(variables, images,
                                mutable=mutable + ["qobs"], **kwargs)
    updates = dict(updates)
    observed = _flatten_qobs(updates.pop("qobs", {}))
    # hand back exactly the collections the caller asked for
    return (out, updates), observed


def qstats_amax(qstats: dict) -> dict:
    """Learned EMA ranges -> the ``{module_path_tuple: float}`` form
    ``quantize_serving(amax=...)`` consumes (zero/unobserved entries are
    dropped — those convs stay float, matching their training path)."""
    host = jax.device_get(qstats)
    return {tuple(p.split("/")): float(v) for p, v in host.items()
            if float(v) > 0.0}

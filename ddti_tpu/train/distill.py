"""Knowledge distillation: train a small student under a frozen teacher.

The deployment story built on the reference's model zoo (serving bundles,
int8, the HTTP daemon) wants SMALL models — a base_filters=32/depth=4
student serves several times faster than the flagship — but small models
trained alone lose quality. Distillation closes that gap: the teacher
(any trained checkpoint, any zoo architecture, incl. reference-format
``.pth``) runs a frozen eval-mode forward on every augmented training
batch, and the student optimizes a blend of the ground-truth composite
loss and a temperature-softened BCE against the teacher's per-pixel
probabilities (the standard Hinton KD recipe, adapted to binary
segmentation: per-pixel sigmoid instead of class softmax).

The teacher forward is fused into the SAME jitted train step as the
student forward/backward (one dispatch per step, like everything else in
train/steps.py); its variables are passed as step arguments, not baked as
constants, so flagship-sized teachers don't blow the remote-compile
program-size cap (CLAUDE.md: HTTP 413). Under ``--grad_accum`` the
teacher runs per microbatch so peak activation memory stays at microbatch
scale. Composes with --qat (the fake-quant interceptor wraps only the
student's apply).

The torch reference (/root/reference) has no distillation; this extends
its Trainer's capability surface (utils/trainer.py:47-119) the same way
the serving/quantization layers do.

Usage::

    ddti-train --model_type UNet --base_filters 32 --depth 4 \
        --distill_checkpoint runs/ResUNet_best.npz \
        --distill_model_type ResUNet --distill_base_filters 64 \
        --distill_depth 5 --distill_weight 0.5 --distill_temperature 2
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kd_bce(student_logits: jnp.ndarray, soft: jnp.ndarray,
           temperature: float) -> jnp.ndarray:
    """Temperature-scaled binary cross-entropy against soft targets,
    numerically stable (the log1p-exp form — never exponentiates a
    positive logit). Scaled by T^2 so the gradient magnitude w.r.t. the
    (unscaled) student logits is temperature-invariant, the standard KD
    convention. Gradient w.r.t. the student logits is
    ``T * (sigmoid(sl/T) - soft)`` — zero exactly when the student
    reproduces the teacher's tempered probabilities."""
    sl = student_logits.astype(jnp.float32) / temperature
    # softplus form: -[t·logσ(s) + (1−t)·log(1−σ(s))]; gradient is exactly
    # σ(sl)−soft everywhere (the max/abs form has a spurious subgradient
    # at sl == 0 — jnp.abs' grad there is 1, not 0)
    bce = (soft * jax.nn.softplus(-sl)
           + (1.0 - soft) * jax.nn.softplus(sl))
    return (temperature * temperature) * bce.mean()


def soft_targets(teacher_apply, tvars: dict, images: jnp.ndarray,
                 temperature: float) -> jnp.ndarray:
    """Frozen eval-mode teacher forward -> tempered per-pixel
    probabilities, gradient-blocked (the teacher is a fixed target, not a
    trainable path). An ensemble teacher (stacked member variables,
    ``teacher_from_config`` with a comma-list checkpoint) returns stacked
    (K, B, H, W, 1) logits; the target is the mean of the members'
    tempered probabilities — distilling the ensemble's vote into one
    student is the classic route to ensemble quality at single-model
    serving cost."""
    out = teacher_apply(tvars, images, train=False)
    logits = out[0] if isinstance(out, tuple) else out
    probs = jax.nn.sigmoid(logits.astype(jnp.float32) / temperature)
    if probs.ndim == images.ndim + 1:  # (K, ...) member axis
        probs = probs.mean(axis=0)
    return jax.lax.stop_gradient(probs)


def teacher_from_config(config, abstract: bool = False):
    """(teacher_apply, variables) for ``config.distill_checkpoint``, or
    ``(None, None)`` when distillation is off. Architecture defaults to
    the student's flags; override with --distill_model_type /
    --distill_base_filters / --distill_depth. The checkpoint loads through
    the universal loader (Orbax dir / .npz / reference .pth).

    ``abstract=True`` returns ``jax.ShapeDtypeStruct`` variables instead
    (no checkpoint read, no device allocation) — for compile-time probes
    like ``--batch_size auto``.

    A COMMA LIST of checkpoints (same teacher architecture — e.g. the K
    fold models of a k-fold training) builds an ensemble teacher: member
    trees stacked on a leading axis, apply vmapped over it (stacked
    member logits out; ``soft_targets`` averages the tempered
    probabilities). The student then learns the ensemble's vote."""
    path = getattr(config, "distill_checkpoint", "") or ""
    if not path:
        return None, None
    paths = [p for p in path.split(",") if p]
    if len(paths) > 1:
        import dataclasses
        members = []
        for p in paths:
            apply_fn, tvars = teacher_from_config(
                dataclasses.replace(config, distill_checkpoint=p),
                abstract=abstract)
            members.append(tvars)
        stack = (lambda *xs: jax.eval_shape(lambda *a: jnp.stack(a), *xs)
                 ) if abstract else (lambda *xs: jnp.stack(xs))
        stacked = jax.tree.map(stack, *members)

        def ens_apply(variables, images, **kw):
            return jax.vmap(lambda m: apply_fn(m, images, **kw))(variables)

        return ens_apply, stacked
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import load_checkpoint_into

    mtype = (getattr(config, "distill_model_type", "") or ""
             ) or config.model_type
    kwargs = dict(
        in_channels=1, out_channels=1,
        base_filters=(int(getattr(config, "distill_base_filters", 0) or 0)
                      or int(config.model_kwargs.get("base_filters", 64))),
        depth=(int(getattr(config, "distill_depth", 0) or 0)
               or int(config.model_kwargs.get("depth", 5))))
    if bool(getattr(config, "use_amp_autocast", True)):
        kwargs["dtype"] = jnp.bfloat16  # same compute policy as serving
    if mtype == "TransUNet":
        kwargs["image_size"] = config.image_size
    extra = getattr(config, "distill_kwargs", "") or ""
    if extra:
        # behavior-only kwargs (num_heads, batch_axis_attention, ...)
        # don't change param shapes — a mismatch would load fine but
        # compute the WRONG teacher, so they must be passed explicitly
        import json
        kwargs.update(json.loads(extra))
    teacher = create_model(mtype, **kwargs)
    size = int(config.image_size)
    if abstract:
        variables = jax.eval_shape(
            lambda: teacher.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, size, size, 1),
                                           jnp.float32), train=False))
        return teacher.apply, {"params": variables["params"],
                               "batch_stats": variables.get("batch_stats",
                                                            {})}
    variables = teacher.init({"params": jax.random.PRNGKey(0)},
                             jnp.zeros((1, size, size, 1), jnp.float32),
                             train=False)
    params, stats = load_checkpoint_into(
        path, mtype, variables["params"], variables.get("batch_stats", {}))
    return teacher.apply, {"params": params, "batch_stats": stats}

"""Jitted train / eval / inference steps.

One ``train_step`` fuses, in a single XLA program on device: uint8->float
conversion, the augmentation chain, mixup, the forward pass (bf16-capable),
all four loss terms, backward, the AdamW update with cosine-warm-restart LR,
BatchNorm stat updates, and the metric confusion counts. The host only feeds
batch indices and reads back a handful of scalars — in contrast to the
reference loop, which does per-step host augmentation, a host EDT round trip
and full-tensor ``.cpu()`` metric syncs
(/root/reference/utils/trainer.py:47-119).

Under a multi-device mesh the same step runs data-parallel via GSPMD: batch
inputs are sharded on "data", state is replicated, and XLA inserts the ICI
psums for gradients, BatchNorm statistics (cross-replica by construction:
the batch mean is a mean over a sharded axis) and metric sums.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ddti_tpu.data.augment import AugmentConfig, augment_batch, eval_preprocess, mixup
from ddti_tpu.eval.metrics import ConfusionCounts, confusion_counts
from ddti_tpu.losses import LossTerms, weighted_loss


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    bce: jnp.ndarray
    dice: jnp.ndarray
    focal: jnp.ndarray
    boundary: jnp.ndarray
    counts: ConfusionCounts
    n: jnp.ndarray
    # 1.0 when --nan_guard rejected this step's update (non-finite loss or
    # gradients); the step's loss/counts/n contributions are zeroed so the
    # epoch averages stay clean. Always 0.0 with the guard off. (Python
    # float default — no jax array may be built at import time, the test
    # conftest must pin the platform before first device use.)
    skipped: jnp.ndarray = 0.0


def _main_logits(out):
    return out[0] if isinstance(out, tuple) else out


def _to_float(images, masks):
    """uint8 [0,255] -> float32 [0,1]; float inputs (host-augmented
    batches) pass through. dtype is static at trace time."""

    def f(x):
        if x.dtype == jnp.uint8:
            return x.astype(jnp.float32) / 255.0
        return x.astype(jnp.float32)

    return f(images), f(masks)


def make_train_step(config, aug_cfg: AugmentConfig,
                    teacher_apply=None) -> Callable:
    """Build the jitted train step:
    (state, images_u8, masks_u8, key[, teacher_vars]) ->
    (state, StepMetrics). ``teacher_apply`` (train/distill.py) fuses a
    frozen teacher forward into the step; its variables arrive as the
    fifth argument (never baked as constants — flagship-sized teachers
    would exceed the remote-compile program cap)."""
    return jax.jit(_build_train_step_impl(config, aug_cfg,
                                          teacher_apply=teacher_apply),
                   donate_argnums=(0,))


def make_host_train_step(config, teacher_apply=None) -> Callable:
    """Train step for the strict host-oracle augmentation path
    (``--host_augment``): batches arrive already augmented/resized as
    float32 (the PIL/cv2 chain ran on the host, exactly like the
    reference's DataLoader), so the device step is mixup + forward/backward
    + update only — the shared step body with the device augmentation
    chain disabled (grad_accum, deep supervision and distillation work
    here too). (state, images_f, masks_f, key[, teacher_vars]) ->
    (state, StepMetrics)."""
    return jax.jit(_build_train_step_impl(config, None, augment=False,
                                          teacher_apply=teacher_apply),
                   donate_argnums=(0,))


def _eval_variables(state, use_ema: bool) -> dict:
    """Evaluation weights: the EMA shadow when --ema_decay is on (the
    standard production choice — smoother than the raw online params),
    else the live params."""
    params = (state.ema_params
              if use_ema and state.ema_params is not None else state.params)
    return {"params": params, "batch_stats": state.batch_stats}


def make_eval_step(config) -> Callable:
    """(state, images_u8, masks_u8) -> StepMetrics (no param update)."""
    loss_kw = dict(bce_ratio=config.bce_ratio, dice_ratio=config.dice_ratio,
                   focal_ratio=config.focal_ratio,
                   boundary_ratio=config.boundary_ratio,
                   compute_unused=config.compute_unused_losses)
    size = (config.image_size, config.image_size)
    use_ema = float(getattr(config, "ema_decay", 0.0) or 0.0) > 0

    def step(state, images_u8, masks_u8, valid=None):
        """``valid`` (B,) f32 {0,1} marks real (non-wraparound-padded)
        images: confusion counts weight each image by it, and ``n`` is
        the valid count, so val metrics count every image exactly once —
        like the reference's unpadded loader. The loss terms remain means
        over the full padded batch (QUIRKS #22). Omitting ``valid`` keeps
        the plain all-images behavior (bench, tests)."""
        images, masks = _to_float(images_u8, masks_u8)
        images, masks = eval_preprocess(images, masks, size)
        out = state.apply_fn(
            _eval_variables(state, use_ema),
            images, train=False)
        logits = _main_logits(out)
        terms = weighted_loss(logits, masks, **loss_kw)
        if valid is None:
            counts = confusion_counts(logits, masks)
            n = jnp.asarray(images.shape[0], jnp.float32)
        else:
            per_img = confusion_counts(logits, masks, per_image=True)
            counts = ConfusionCounts(
                *((v * valid).sum() for v in per_img))
            n = valid.sum()
        return StepMetrics(terms.total, terms.bce, terms.dice, terms.focal,
                           terms.boundary, counts, n)

    return jax.jit(step)


def make_infer_step(config, threshold: float = 0.5) -> Callable:
    """(state, images_u8, masks_u8) -> (images_f, masks_f, preds_u8, counts)
    for the test routine (predictions come back binarized uint8).

    With ``config.tta`` the logits are the 4-way flip-TTA ensemble
    (eval/tta.py) — all four forwards fuse into this one jitted step.
    ``threshold`` is the binarization operating point (0.5 = reference;
    --tune_threshold rebuilds the step with the val-selected value)."""
    size = (config.image_size, config.image_size)
    use_tta = bool(getattr(config, "tta", False))
    use_ema = float(getattr(config, "ema_decay", 0.0) or 0.0) > 0

    def step(state, images_u8, masks_u8):
        images, masks = _to_float(images_u8, masks_u8)
        images, masks = eval_preprocess(images, masks, size)

        def fwd(x):
            out = state.apply_fn(_eval_variables(state, use_ema),
                                 x, train=False)
            return _main_logits(out)

        if use_tta:
            from ddti_tpu.eval.tta import tta_logits
            logits = tta_logits(fwd, images)
        else:
            logits = fwd(images)
        preds = (jax.nn.sigmoid(logits.astype(jnp.float32)) > threshold
                 ).astype(jnp.uint8)
        # one per-image reduction; the global counts are its sum (the
        # same values the reference's flattened test() pass produces)
        per_img = confusion_counts(logits, masks, threshold=threshold,
                                   per_image=True)
        counts = ConfusionCounts(*(x.sum() for x in per_img))
        return images, masks, preds, counts, per_img

    return jax.jit(step)


def make_threshold_sweep_step(config, thresholds) -> Callable:
    """(state, images_u8, masks_u8[, valid]) -> ConfusionCounts with a
    leading thresholds axis: ONE pass over a split scores every candidate
    binarization threshold at once (--tune_threshold). Uses the same
    logits as the test path (EMA shadow / flip-TTA ensemble when those
    are enabled) so the tuned operating point transfers exactly.
    ``valid`` (B,) f32 {0,1} weights out wraparound-padded duplicates,
    matching validate()'s exact per-image accounting (QUIRKS #22)."""
    size = (config.image_size, config.image_size)
    use_tta = bool(getattr(config, "tta", False))
    use_ema = float(getattr(config, "ema_decay", 0.0) or 0.0) > 0
    ts = jnp.asarray(thresholds, jnp.float32)

    def step(state, images_u8, masks_u8, valid=None):
        images, masks = _to_float(images_u8, masks_u8)
        images, masks = eval_preprocess(images, masks, size)

        def fwd(x):
            out = state.apply_fn(_eval_variables(state, use_ema),
                                 x, train=False)
            return _main_logits(out)

        if use_tta:
            from ddti_tpu.eval.tta import tta_logits
            logits = tta_logits(fwd, images)
        else:
            logits = fwd(images)

        def counts_at(t):
            if valid is None:
                return confusion_counts(logits, masks, threshold=t)
            per_img = confusion_counts(logits, masks, threshold=t,
                                       per_image=True)
            return ConfusionCounts(*((v * valid).sum() for v in per_img))

        return jax.vmap(counts_at)(ts)

    return jax.jit(step)


@functools.partial(jax.jit, donate_argnums=())
def gather_batch(images: jnp.ndarray, masks: jnp.ndarray, idx: jnp.ndarray):
    """Device-side batch gather from the resident dataset store."""
    return images[idx], masks[idx]


def make_scan_epoch(config, aug_cfg: AugmentConfig,
                    teacher_apply=None) -> Callable:
    """The whole training epoch as ONE XLA program.

    With the dataset resident in HBM, scan over the per-step index arrays:
    gather -> augment -> forward/backward -> update, all inside a single
    dispatch. The host's only per-epoch work is a permutation and a key.

    Returns ``epoch_fn(state, images_store, masks_store, idx, key
    [, teacher_vars]) -> (state, StepMetrics-stacked)`` where ``idx`` is
    (steps, batch) int32.
    """
    step_impl = _build_train_step_impl(config, aug_cfg,
                                       teacher_apply=teacher_apply)

    def epoch(state, images_store, masks_store, idx, key, tvars=None):
        # fold_in per step — identical derivation to the stepwise engine
        # path, so the two modes are bit-identical
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(idx.shape[0]))

        def body(s, xs):
            batch_idx, k = xs
            images = images_store[batch_idx]
            masks = masks_store[batch_idx]
            s, m = step_impl(s, images, masks, k, tvars)
            return s, m

        state, metrics = jax.lax.scan(body, state, (idx, keys))
        return state, metrics

    return jax.jit(epoch, donate_argnums=(0,))


def _ds_aux_loss(out, masks, loss_kw, ds_weight: float):
    """Deep-supervision auxiliary loss (ImprovedVNet with
    deep_supervision=True returns (logits, [per-level logits])): the same
    weighted loss on each head against the bilinearly downsampled target,
    averaged over heads and scaled by ``ds_weight`` (the reference parses
    an ``--alpha`` flag but never uses it — here it weights this term).
    Boundary term excluded at aux scale (EDT per level is not worth it)."""
    from ddti_tpu.ops.resample import resize_bilinear_hw

    _, ds_outs = out
    kw = dict(loss_kw)
    kw["boundary_ratio"] = 0.0
    kw["compute_unused"] = False
    total = jnp.float32(0.0)
    for head in ds_outs:
        m = masks
        if head.shape[1:3] != masks.shape[1:3]:
            m = resize_bilinear_hw(masks[..., 0], head.shape[1],
                                   head.shape[2])[..., None]
        total = total + weighted_loss(head, m, **kw).total
    return ds_weight * total / max(len(ds_outs), 1)


def _build_train_step_impl(config, aug_cfg: AugmentConfig | None,
                           augment: bool = True,
                           teacher_apply=None) -> Callable:
    """Unjitted train-step body shared by make_train_step / make_scan_epoch
    / make_host_train_step (``augment=False`` skips the device augmentation
    chain for host-augmented float batches; ``teacher_apply`` enables the
    distillation path — see train/distill.py)."""
    loss_kw = dict(bce_ratio=config.bce_ratio, dice_ratio=config.dice_ratio,
                   focal_ratio=config.focal_ratio,
                   boundary_ratio=config.boundary_ratio,
                   compute_unused=config.compute_unused_losses)
    use_mixup = bool(config.use_mixup)
    mixup_alpha = float(config.mixup_alpha)
    mixup_prob = float(config.mixup_prob)
    ds_weight = float(getattr(config, "alpha", 0.0) or 0.0)
    grad_accum = int(getattr(config, "grad_accum", 1) or 1)
    ema_decay = float(getattr(config, "ema_decay", 0.0) or 0.0)
    nan_guard = bool(getattr(config, "nan_guard", False))
    # --qat: fake-quantized conv forwards + activation-range EMA
    # (train/qat.py); state.qstats must be initialized (create_train_state
    # qat=True)
    qat = bool(getattr(config, "qat", False))
    # 0.0 is a valid decay (track the latest batch amax only) — no `or`
    qat_decay = float(getattr(config, "qat_ema_decay", 0.99))
    # --distill_checkpoint: blend the ground-truth composite loss with a
    # tempered BCE against the frozen teacher's probabilities
    # (train/distill.py); teacher variables arrive as the step's tvars arg
    kd_w = (float(getattr(config, "distill_weight", 0.5))
            if teacher_apply is not None else 0.0)  # 0.0 is a valid weight
    kd_t = float(getattr(config, "distill_temperature", 2.0) or 2.0)
    # --freeze_bn_stats: frozen modules' BN running stats keep their
    # step-start values (params are frozen by the optimizer mask,
    # state.py make_optimizer)
    from .state import parse_freeze
    frozen_bn = (parse_freeze(config)
                 if getattr(config, "freeze_bn_stats", False) else ())

    def merge_bstats(new, old):
        if not frozen_bn:
            return new
        from .state import keep_frozen_bstats
        return keep_frozen_bstats(new, old, frozen_bn)

    def finite_all(grads, loss):
        """Scalar bool: the loss and EVERY gradient element are finite —
        one fused isfinite-reduce pass over the gradient tree (small next
        to the backward pass that produced it)."""
        ok = jnp.isfinite(loss)
        for g in jax.tree.leaves(grads):
            ok = jnp.logical_and(ok, jnp.isfinite(g).all())
        return ok

    def guarded_update(state, grads, bstats, terms, counts, n,
                       observed=None):
        """--nan_guard: apply the update only when loss+grads are finite;
        a rejected step keeps the ENTIRE old state (params, opt state, BN
        stats, EMA, QAT ranges, step counter — the step retries at the
        same schedule position) and contributes zeros to the epoch
        metrics. The where-select costs one elementwise pass over the
        state — same order as the optimizer update itself, and only paid
        opt-in."""
        ok = finite_all(grads, terms.total)
        new_state = state.apply_gradients(grads, bstats)
        if ema_decay:
            new_state = new_state.update_ema(ema_decay)
        if qat and observed is not None:
            new_state = new_state.update_qstats(observed, qat_decay)
        state = jax.tree.map(lambda nw, od: jnp.where(ok, nw, od),
                             new_state, state)
        okf = ok.astype(jnp.float32)
        terms = jax.tree.map(lambda t: t * okf, terms)
        counts = jax.tree.map(lambda c: c * okf, counts)
        return state, StepMetrics(terms.total, terms.bce, terms.dice,
                                  terms.focal, terms.boundary, counts,
                                  n * okf, skipped=1.0 - okf)

    def make_loss_fn(state, images, masks, k_drop, soft=None):
        def loss_fn(params, batch_stats):
            variables = {"params": params, "batch_stats": batch_stats}
            kw = dict(train=True, mutable=["batch_stats"],
                      rngs={"dropout": k_drop})
            if qat:
                from ddti_tpu.train.qat import qat_apply
                (out, updates), observed = qat_apply(
                    state.apply_fn, variables, images,
                    state.qstats or {}, **kw)
            else:
                out, updates = state.apply_fn(variables, images, **kw)
                observed = {}
            logits = _main_logits(out)
            terms = weighted_loss(logits, masks, **loss_kw)
            total = terms.total
            if isinstance(out, tuple) and ds_weight > 0:
                total = total + _ds_aux_loss(out, masks, loss_kw, ds_weight)
            if soft is not None:
                from ddti_tpu.train.distill import kd_bce
                total = (1.0 - kd_w) * total + kd_w * kd_bce(logits, soft,
                                                             kd_t)
            terms = terms._replace(total=total)
            return terms.total, (terms, updates, logits, observed)

        return loss_fn

    def step(state, images_u8, masks_u8, key, tvars=None):
        images, masks = _to_float(images_u8, masks_u8)
        k_aug, k_mix, k_drop = jax.random.split(key, 3)
        if augment:
            images, masks = augment_batch(k_aug, images, masks, aug_cfg)
        if use_mixup:
            images, masks = mixup(k_mix, images, masks, mixup_alpha,
                                  mixup_prob)
        n = jnp.asarray(images.shape[0], jnp.float32)

        def teacher_soft(x):
            """Tempered frozen-teacher probabilities for ``x`` (None when
            distillation is off). Called on the full batch in the one-shot
            path and per microbatch under grad_accum (keeps peak
            activation memory at microbatch scale)."""
            if teacher_apply is None:
                return None
            from ddti_tpu.train.distill import soft_targets
            return soft_targets(teacher_apply, tvars, x, kd_t)

        if grad_accum == 1:
            loss_fn = make_loss_fn(state, images, masks, k_drop,
                                   teacher_soft(images))
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (_, (terms, updates, logits, observed)), grads = grad_fn(
                state.params, state.batch_stats)
            counts = confusion_counts(logits, masks)
            bstats = merge_bstats(updates["batch_stats"],
                                  state.batch_stats)
            if nan_guard:
                return guarded_update(state, grads, bstats,
                                      terms, counts, n, observed)
            state = state.apply_gradients(grads, bstats)
            if ema_decay:
                state = state.update_ema(ema_decay)
            if qat:
                state = state.update_qstats(observed, qat_decay)
            return state, StepMetrics(terms.total, terms.bce, terms.dice,
                                      terms.focal, terms.boundary, counts, n)

        # Gradient accumulation: scan over grad_accum microbatches of the
        # (already augmented/mixed) batch, sum gradients and metrics, apply
        # ONE optimizer update with the mean gradient. Peak activation
        # memory drops to the microbatch's — effective batches that OOM in
        # one shot (e.g. 32 @ 512^2 f32 on a 16 GB chip) fit without remat.
        # BatchNorm normalizes per MICROBATCH and chains its EMA through
        # the scan (the standard accumulation semantics — same as torch
        # accumulation loops; a grad_accum>1 step is therefore NOT
        # bit-identical to the same batch in one shot).
        if images.shape[0] % grad_accum:
            raise ValueError(
                f"batch_size {images.shape[0]} not divisible by "
                f"grad_accum {grad_accum}")
        micro = images.shape[0] // grad_accum
        im = images.reshape(grad_accum, micro, *images.shape[1:])
        mk = masks.reshape(grad_accum, micro, *masks.shape[1:])
        kd = jax.vmap(lambda i: jax.random.fold_in(k_drop, i))(
            jnp.arange(grad_accum))

        zero = jnp.float32(0.0)
        g0 = jax.tree.map(jnp.zeros_like, state.params)
        t0 = LossTerms(zero, zero, zero, zero, zero)
        c0 = ConfusionCounts(zero, zero, zero, zero, zero, zero)
        # QAT range observations: microbatches observe independently; the
        # step's range is their elementwise max
        o0 = ({p: zero for p in state.qstats} if qat and state.qstats
              else {})

        def body(carry, xs):
            bstats, gacc, tacc, cacc, oacc = carry
            xi, mi, ki = xs
            loss_fn = make_loss_fn(state, xi, mi, ki, teacher_soft(xi))
            (_, (terms, updates, logits, observed)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, bstats))
            gacc = jax.tree.map(jnp.add, gacc, grads)
            tacc = jax.tree.map(jnp.add, tacc, terms)
            cacc = cacc + confusion_counts(logits, mi)
            oacc = {p: jnp.maximum(oacc[p], observed.get(p, zero))
                    for p in oacc}
            return (updates["batch_stats"], gacc, tacc, cacc, oacc), None

        (bstats, gsum, tsum, counts, observed), _ = jax.lax.scan(
            body, (state.batch_stats, g0, t0, c0, o0), (im, mk, kd))
        bstats = merge_bstats(bstats, state.batch_stats)
        inv = jnp.float32(1.0 / grad_accum)
        grads = jax.tree.map(lambda g: g * inv, gsum)
        terms = jax.tree.map(lambda t: t * inv, tsum)
        if nan_guard:
            # one non-finite microbatch poisons the summed gradient, so
            # the whole accumulated step is rejected as a unit
            return guarded_update(state, grads, bstats, terms, counts, n,
                                  observed if qat else None)
        state = state.apply_gradients(grads, bstats)
        if ema_decay:
            state = state.update_ema(ema_decay)
        if qat:
            state = state.update_qstats(observed, qat_decay)
        return state, StepMetrics(terms.total, terms.bce, terms.dice,
                                  terms.focal, terms.boundary, counts, n)

    return step


def accumulate(total: StepMetrics | None, m: StepMetrics) -> StepMetrics:
    """Host-side accumulation of per-batch metrics (weighted by n;
    ``skipped`` is an unweighted step count)."""
    if total is None:
        weighted = StepMetrics(m.loss * m.n, m.bce * m.n, m.dice * m.n,
                               m.focal * m.n, m.boundary * m.n, m.counts,
                               m.n, m.skipped)
        return weighted
    return StepMetrics(
        total.loss + m.loss * m.n, total.bce + m.bce * m.n,
        total.dice + m.dice * m.n, total.focal + m.focal * m.n,
        total.boundary + m.boundary * m.n,
        total.counts + m.counts, total.n + m.n,
        total.skipped + m.skipped)

"""Train state: params + BatchNorm stats + optimizer state + step.

The functional replacement for the reference Trainer's mutable model/
optimizer/scheduler attributes (/root/reference/utils/trainer.py:19-45).
AdamW reproduces the reference's *effective* optimizer: the weight_decay
flag is parsed but never passed there, so torch's default 0.01 applies —
we default to the same.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .schedule import cosine_warm_restarts


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # exponential moving average of params (None unless ema_decay > 0);
    # evaluation/test/serving use these when present — the standard
    # production trick for smoother segmentation masks
    ema_params: Any = None
    # --qat: per-conv activation-range EMA ({"path/to/conv": f32 amax},
    # train/qat.py); None unless quantization-aware training is on.
    # Consumed at int8 export time in place of one-batch calibration.
    qstats: Any = None
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)
    apply_fn: Callable = struct.field(pytree_node=False, default=None)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)

    def update_ema(self, decay: float) -> "TrainState":
        """ema <- decay*ema + (1-decay)*params (no-op when EMA is off)."""
        if self.ema_params is None:
            return self
        d = jnp.float32(decay)
        ema = jax.tree.map(
            lambda e, p: (e * d + p.astype(e.dtype) * (1 - d)),
            self.ema_params, self.params)
        return self.replace(ema_params=ema)

    def update_qstats(self, observed: dict, decay: float) -> "TrainState":
        """amax EMA: ``ema <- decay*ema + (1-decay)*batch_amax``; an
        unobserved entry (0.0) seeds directly from the first batch. No-op
        when QAT is off."""
        if self.qstats is None:
            return self
        d = jnp.float32(decay)
        new = {}
        for p, old in self.qstats.items():
            a = observed.get(p)
            new[p] = old if a is None else jnp.where(
                old > 0, old * d + a * (1 - d), a)
        return self.replace(qstats=new)


def flat_fused(inner: optax.GradientTransformation
               ) -> optax.GradientTransformation:
    """Run ``inner`` over ONE contiguous flat vector instead of per-leaf.

    Numerics are identical — the update is elementwise; optimizer state
    (m, v) is stored flat. MEASURED NEGATIVE on v5e for the 130M-param
    flagship (537.8 vs 523.7 ms/step, benchmarks/opt_ab.py): the
    ravel/unravel concat+slice traffic costs more than the per-leaf
    kernel-launch overhead it removes. Kept opt-in for small-param
    models where launch overhead dominates."""
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        flat_p = ravel_pytree(params)[0] if params is not None else None
        upd, new_state = inner.update(flat_g, state, flat_p)
        return unravel(upd), new_state

    return optax.GradientTransformation(init, update)


def _param_path(kp) -> str:
    """'/'-joined key path ("encoders_0/conv1/kernel") — the same naming
    the QAT range tree and --freeze prefixes use."""
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in kp)


def parse_freeze(config) -> tuple:
    """The --freeze prefixes as a tuple — THE parse used everywhere
    (engine, steps, autobatch, lr_finder), so they can't disagree about
    what is frozen."""
    return tuple(p.strip() for p in
                 str(getattr(config, "freeze", "") or "").split(",")
                 if p.strip())


def _freeze_match(path: str, prefixes: tuple) -> bool:
    """True when ``path`` is frozen by any prefix. A prefix matches at
    path-segment boundaries only — plus the auto-numbered-list
    convenience: a final prefix segment ``encoders`` also matches
    ``encoders_<digits>``. So ``encoders`` catches ``encoders_0/...``
    but ``layers_1`` does NOT catch ``layers_10/...`` (a bare
    ``str.startswith`` would)."""
    segs = path.split("/")
    for p in prefixes:
        psegs = p.split("/")
        if len(psegs) > len(segs):
            continue
        if psegs[:-1] != segs[:len(psegs) - 1]:
            continue
        last, seg = psegs[-1], segs[len(psegs) - 1]
        if seg == last or (seg.startswith(last + "_")
                           and seg[len(last) + 1:].isdigit()):
            return True
    return False


def freeze_labels(params, prefixes):
    """Per-leaf 'frozen'/'trainable' labels for ``optax.multi_transform``:
    a param is frozen when its '/'-joined path matches ANY prefix at
    segment boundaries (``encoders`` catches ``encoders_0/...`` through
    ``encoders_N/...`` — see ``_freeze_match``). Returns
    ``(labels_tree, n_frozen_leaves)``."""
    import jax.tree_util as jtu

    pfx = tuple(prefixes)
    labels = jtu.tree_map_with_path(
        lambda kp, _: ("frozen" if _freeze_match(_param_path(kp), pfx)
                       else "trainable"), params)
    n_frozen = sum(1 for v in jax.tree.leaves(labels) if v == "frozen")
    return labels, n_frozen


def describe_freeze(params, prefixes) -> str:
    """Human-readable '<frozen>/<total> params' summary for the engine's
    log line — same ``freeze_labels`` the optimizer mask uses, so the
    description can't drift from the actual mask."""
    labels, _ = freeze_labels(params, prefixes)
    sizes = [(int(p.size), lab) for p, lab in
             zip(jax.tree.leaves(params), jax.tree.leaves(labels))]
    n_f = sum(s for s, lab in sizes if lab == "frozen")
    return f"{n_f:,}/{sum(s for s, _ in sizes):,}"


def keep_frozen_bstats(new_bstats, old_bstats, prefixes):
    """--freeze_bn_stats: running BatchNorm statistics of frozen modules
    keep their step-start values (the strict frozen-feature-extractor
    semantic); unfrozen modules update normally. Plain --freeze leaves
    stats adapting — the standard BN-adapt transfer behavior. Same
    segment-boundary prefix matching as the optimizer mask."""
    import jax.tree_util as jtu

    pfx = tuple(prefixes)
    return jtu.tree_map_with_path(
        lambda kp, n, o: o if _freeze_match(_param_path(kp), pfx) else n,
        new_bstats, old_bstats)


def make_optimizer(lr: float, steps_per_epoch: int,
                   weight_decay: float = 1e-2,
                   t_0: int = 20, t_mult: int = 2,
                   fused: bool = False,
                   clip_norm: float = 0.0,
                   freeze: Any = None) -> tuple:
    """``clip_norm > 0`` chains global-norm gradient clipping ahead of
    AdamW (--clip_grad_norm) — the standard divergence brake the reference
    lacks (its optimizer is bare AdamW, /root/reference/utils/trainer.py:36).
    0 disables (exact reference parity).

    ``freeze`` is a 'frozen'/'trainable' labels tree (``freeze_labels``):
    frozen leaves get ``optax.set_to_zero`` — no update, no weight decay,
    no moment buffers — the fine-tuning path (--freeze)."""
    sched = cosine_warm_restarts(lr, steps_per_epoch, t_0, t_mult)
    tx = optax.adamw(learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=weight_decay)
    tx = compose_mask_clip(tx, freeze, clip_norm)
    if fused:
        tx = flat_fused(tx)
    return tx, sched


def compose_mask_clip(tx, freeze, clip_norm: float):
    """The freeze/clip composition shared by ``make_optimizer`` and the
    lr-finder's ramp optimizer (they must run the SAME chain or the
    range test probes a different problem than training solves)."""
    if freeze is not None:
        # masked inner optimizer (not just zeroed grads): AdamW's
        # decoupled weight decay would otherwise still shrink frozen
        # params every step
        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, freeze)
    if clip_norm and clip_norm > 0:
        pre = [optax.clip_by_global_norm(float(clip_norm))]
        if freeze is not None:
            # zero frozen grads BEFORE the norm so they don't inflate it
            # (they are discarded anyway)
            pre.insert(0, optax.multi_transform(
                {"trainable": optax.identity(),
                 "frozen": optax.set_to_zero()}, freeze))
        tx = optax.chain(*pre, tx)
    return tx


def create_train_state(model, key, input_shape, lr: float,
                       steps_per_epoch: int,
                       weight_decay: float = 1e-2,
                       ema: bool = False,
                       clip_norm: float = 0.0,
                       qat: bool = False,
                       quant_min_channels: int = 0,
                       freeze: tuple = ()) -> TrainState:
    x0 = jnp.zeros(input_shape, jnp.float32)

    def init_variables(k, x):
        return model.init({"params": k}, x, train=False)

    labels = None
    if freeze:
        # freeze_labels only looks at tree paths — derive them from the
        # abstract init (no compute) so the optimizer can be built before
        # the single fused init program below.
        abs_params = jax.eval_shape(init_variables, key, x0)["params"]
        labels, n_frozen = freeze_labels(abs_params, freeze)
        if n_frozen == 0:
            raise ValueError(
                f"--freeze {','.join(freeze)} matched no parameters; "
                "prefixes are '/'-joined module paths like 'encoders' or "
                "'encoders_0/conv1'")
    tx, _ = make_optimizer(lr, steps_per_epoch, weight_decay,
                           clip_norm=clip_norm, freeze=labels)

    # Param init + optimizer-moment init as ONE compiled program: running
    # flax's init eagerly dispatches every op separately, which through a
    # remote-dispatch TPU backend (~30-50 ms/op) costs minutes at flagship
    # scale — jitted it is one compile + one execution.
    def init_state(k, x):
        variables = init_variables(k, x)
        params = variables["params"]
        return (params, variables.get("batch_stats", {}), tx.init(params),
                jax.tree.map(jnp.copy, params) if ema else None)

    params, batch_stats, opt_state, ema_params = jax.jit(init_state)(key, x0)
    if qat:
        from .qat import init_qstats
        qstats = init_qstats(model,
                             {"params": params, "batch_stats": batch_stats},
                             input_shape, quant_min_channels)
    else:
        qstats = None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        ema_params=ema_params,
        qstats=qstats,
        tx=tx,
        apply_fn=model.apply,
    )


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))

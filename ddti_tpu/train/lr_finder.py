"""Learning-rate range test (Smith, "Cyclical Learning Rates", 2015/17).

The reference trains everything at a fixed ``--lr 1e-5``
(/root/reference/main.py:49) with no tooling to choose it. ``--lr_find N``
runs the classic range test instead of training: N optimizer steps on the
real train step and real batches, learning rate ramped geometrically from
``--lr_find_min`` to ``--lr_find_max``, loss recorded per step. The sweep
reuses the session's already-compiled train step machinery — the ramp is
just a different optax schedule on a disposable copy of the train state,
so the probe never touches the run's actual weights or optimizer.

Outputs into the run's ``result/`` dir: ``lr_find.csv`` (step, lr, loss,
smoothed) and ``lr_find.png`` (log-lr loss curve with the suggestions
marked). Two standard suggestions are logged: the steepest descent point
of the smoothed curve, and min-loss/10 (the fastai heuristics).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def run_lr_finder(trainer, num_steps: int = 100, min_lr: float = 1e-7,
                  max_lr: float = 1.0, smooth_beta: float = 0.98,
                  diverge_factor: float = 4.0) -> dict:
    """Execute the range test on ``trainer``'s train source. Returns
    ``{"lr_steepest", "lr_min_over_10", "history"}``; the trainer's own
    state is untouched (the sweep runs on donated copies)."""
    import optax

    from .state import TrainState

    cfg = trainer.config
    num_steps = max(int(num_steps), 2)
    ratio = max_lr / min_lr

    def ramp(step):
        frac = jnp.minimum(step, num_steps - 1) / (num_steps - 1)
        return min_lr * ratio ** frac

    tx = optax.adamw(learning_rate=ramp, b1=0.9, b2=0.999, eps=1e-8,
                     weight_decay=cfg.weight_decay)
    # probe the SAME optimizer composition training will use (masked
    # AdamW under --freeze, frozen-grad-excluded clipping) — the useful-lr
    # range of a masked/clipped problem differs from the bare one
    from .state import compose_mask_clip, freeze_labels, parse_freeze
    freeze = parse_freeze(cfg)
    labels = (freeze_labels(trainer.state.params, freeze)[0]
              if freeze else None)
    tx = compose_mask_clip(
        tx, labels, float(getattr(cfg, "clip_grad_norm", 0.0) or 0.0))
    # disposable state: copies (the jitted step donates its state arg),
    # starting from the run's current weights — a warm-started run probes
    # around the restored optimum, a fresh run around the init. qstats
    # carried so a --qat run probes the fake-quant loss landscape, not
    # the float one.
    src_state = trainer.state
    params = jax.tree.map(jnp.copy, src_state.params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=jax.tree.map(jnp.copy, src_state.batch_stats),
        opt_state=tx.init(params), ema_params=None,
        qstats=(jax.tree.map(jnp.copy, src_state.qstats)
                if getattr(src_state, "qstats", None) is not None
                else None),
        tx=tx, apply_fn=src_state.apply_fn)

    history = []  # (lr, loss, smoothed)
    ema = 0.0
    best = math.inf
    key = jax.random.fold_in(trainer.key, 0x1F)
    stop_reason = "completed"
    i = 0
    while i < num_steps and stop_reason == "completed":
        made_progress = False
        for batch in trainer._iter_batches(trainer.train_src, shuffle=True):
            made_progress = True
            images, masks = batch
            key, k = jax.random.split(key)
            # the step was built by the Trainer: under --distill it takes
            # the teacher variables as its fifth argument
            state, m = trainer.train_step(state, images, masks, k,
                                          trainer._teacher_vars)
            loss = float(m.loss)
            lr = min_lr * ratio ** (i / (num_steps - 1))
            if not math.isfinite(loss):
                stop_reason = f"non-finite loss at lr={lr:.3g}"
                break
            ema = smooth_beta * ema + (1 - smooth_beta) * loss
            sm = ema / (1 - smooth_beta ** (i + 1))
            history.append((lr, loss, sm))
            best = min(best, sm)
            i += 1
            if sm > diverge_factor * best and i > 10:
                stop_reason = f"diverged at lr={lr:.3g}"
                break
            if i >= num_steps:
                break
        if not made_progress:
            raise RuntimeError("empty train source; cannot run lr_find")

    if len(history) < 5:
        raise RuntimeError(
            f"lr_find collected only {len(history)} finite steps "
            f"({stop_reason}); lower --lr_find_max")

    lrs = np.array([h[0] for h in history])
    sms = np.array([h[2] for h in history])
    # steepest descent of the smoothed curve in log-lr space (central
    # differences); skip the edges where the EMA is still biased
    grad = np.gradient(sms, np.log(lrs))
    lo = min(5, len(grad) // 4)
    core = slice(lo, len(grad) - 1)
    lr_steepest = float(lrs[core][np.argmin(grad[core])])
    lr_min_over_10 = float(lrs[np.argmin(sms)] / 10.0)

    rd = cfg.result_dir or "."
    os.makedirs(rd, exist_ok=True)
    csv_path = os.path.join(rd, "lr_find.csv")
    with open(csv_path, "w") as f:
        f.write("step,lr,loss,smoothed\n")
        for j, (lr, loss, sm) in enumerate(history):
            f.write(f"{j},{lr:.6g},{loss:.6g},{sm:.6g}\n")

    png_path = os.path.join(rd, "lr_find.png")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(7, 4.5))
        ax.plot(lrs, [h[1] for h in history], alpha=0.3, label="loss")
        ax.plot(lrs, sms, label="smoothed")
        ax.axvline(lr_steepest, color="tab:green", ls="--",
                   label=f"steepest {lr_steepest:.2g}")
        ax.axvline(lr_min_over_10, color="tab:red", ls=":",
                   label=f"min/10 {lr_min_over_10:.2g}")
        ax.set_xscale("log")
        ax.set_xlabel("learning rate")
        ax.set_ylabel("loss")
        ax.set_title(f"LR range test ({len(history)} steps, {stop_reason})")
        ax.legend()
        fig.tight_layout()
        fig.savefig(png_path, dpi=110)
        plt.close(fig)
    except Exception as e:  # matplotlib must never sink the sweep
        trainer.logger.warning(f"lr_find plot skipped: {e}")
        png_path = None

    trainer.logger.info(
        f"LR range test: {len(history)} steps ({stop_reason}); "
        f"suggested --lr {lr_steepest:.3g} (steepest descent) or "
        f"{lr_min_over_10:.3g} (min-loss/10) — curve in {csv_path}")
    return {"lr_steepest": lr_steepest, "lr_min_over_10": lr_min_over_10,
            "history": history, "stop_reason": stop_reason,
            "csv": csv_path, "png": png_path}

"""Automatic batch-size selection from XLA's compile-time memory plan.

XLA assigns every buffer at compile time, so the peak HBM of a training
program is known BEFORE anything is allocated or run: lower the real
train step with abstract (``jax.ShapeDtypeStruct``) operands, compile,
and read ``compiled.memory_analysis()``. ``pick_batch_size`` walks the
candidate list until the predicted peak exceeds the device budget and
returns the largest candidate that fits — replacing the bisect-by-OOM
ritual the torch reference leaves to the operator (its per-GPU batch
sizes are hand-recorded; /root/reference/main.py:20 just defaults to 16).

Because the probe compiles the *same* program the run will execute, the
winning candidate's compile lands in the persistent compilation cache
and is reused when training starts — the probe's cost is roughly one
wasted compile per rejected candidate, zero device memory, zero steps.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterable, Optional, Sequence

# Per-chip HBM when the backend doesn't report a limit (v5e single chip —
# matches the measured 15.75 GB usable HBM; benchmarks/PERF_NOTES.md).
_TPU_DEFAULT_HBM = int(15.75 * 2**30)

DEFAULT_CANDIDATES = (8, 16, 32, 64, 128, 256, 512)


def device_budget_bytes(device=None) -> int:
    """Usable bytes on one accelerator: the backend's reported limit when
    available, else a platform default (TPU: 15.75 GiB/chip; CPU: host
    RAM — the 8-device test mesh shares one address space)."""
    import jax

    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit
    except Exception:
        pass
    if device.platform == "tpu":
        return _TPU_DEFAULT_HBM
    try:
        return os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError):
        return _TPU_DEFAULT_HBM


def predicted_step_peak_bytes(config, model, batch: int,
                              host_augment: bool = False) -> int:
    """Peak HBM (bytes) of one train step at ``batch``, from the compiled
    program's buffer assignment — nothing is allocated or executed.

    Donation is accounted: the donated state aliases its output, so the
    estimate is args + outputs − aliased + temporaries (or the backend's
    own ``peak_memory_in_bytes`` when it reports one, whichever is
    larger)."""
    import jax
    import jax.numpy as jnp

    from .engine import aug_config_from
    from .state import create_train_state
    from .steps import make_host_train_step, make_train_step

    cfg = dataclasses.replace(config, batch_size=batch)
    in_ch = getattr(model, "in_channels", 1)
    from .state import parse_freeze
    freeze = parse_freeze(cfg)
    # abstract state: eval_shape traces init + optimizer without touching
    # the device; static fields (tx, apply_fn) survive as real objects.
    # qat/freeze change the state structure (range tree, masked opt
    # state) — probe the SAME structure the run will use
    state = jax.eval_shape(lambda: create_train_state(
        model, jax.random.PRNGKey(0),
        (1, cfg.image_size, cfg.image_size, in_ch),
        cfg.lr, steps_per_epoch=100, weight_decay=cfg.weight_decay,
        ema=float(getattr(cfg, "ema_decay", 0.0) or 0.0) > 0,
        clip_norm=float(getattr(cfg, "clip_grad_norm", 0.0) or 0.0),
        qat=bool(getattr(cfg, "qat", False)),
        quant_min_channels=int(getattr(cfg, "quant_min_channels", 0)
                               or 0),
        freeze=freeze))
    # --distill: the teacher's weights AND forward activations are part
    # of the step's footprint; probe with abstract teacher variables
    # (shape-only — no checkpoint read, no device allocation)
    from .distill import teacher_from_config
    t_apply, t_vars = teacher_from_config(cfg, abstract=True)
    extra = (t_vars,) if t_apply is not None else ()
    if host_augment:
        step = make_host_train_step(cfg, teacher_apply=t_apply)
        side, dt = cfg.image_size, jnp.float32
    else:
        step = make_train_step(cfg, aug_config_from(cfg),
                               teacher_apply=t_apply)
        side, dt = cfg.store_size, jnp.uint8
    im = jax.ShapeDtypeStruct((batch, side, side, in_ch), dt)
    ma = jax.ShapeDtypeStruct((batch, side, side, 1), dt)
    key = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    mem = step.lower(state, im, ma, key,
                     *extra).compile().memory_analysis()
    est = (mem.argument_size_in_bytes + mem.output_size_in_bytes
           - mem.alias_size_in_bytes + mem.temp_size_in_bytes)
    return max(int(getattr(mem, "peak_memory_in_bytes", 0) or 0), int(est))


def pick_batch_size(config, model, *,
                    candidates: Sequence[int] = DEFAULT_CANDIDATES,
                    budget_bytes: Optional[int] = None,
                    safety: float = 0.92,
                    data_parallel: int = 1,
                    host_augment: bool = False,
                    logger=None) -> int:
    """Largest candidate whose predicted step peak fits ``safety`` of the
    per-device budget.

    Candidates are PER-DEVICE batch sizes, probed ascending; the return
    value is the GLOBAL batch (candidate × ``data_parallel`` — under data
    parallelism params/optimizer are replicated and activations scale
    with the per-device shard, so the single-device program is the right
    proxy for each chip's footprint). Probing stops at the first
    candidate over budget: peak grows monotonically with batch."""
    grad_accum = max(int(getattr(config, "grad_accum", 1) or 1), 1)
    usable = [b for b in sorted(set(candidates)) if b % grad_accum == 0]
    if not usable:
        raise ValueError(
            f"no batch-size candidate in {sorted(set(candidates))} is "
            f"divisible by --grad_accum {grad_accum}")
    budget = budget_bytes if budget_bytes is not None else (
        device_budget_bytes())
    cap = int(budget * safety)
    best = None
    for b in usable:
        try:
            peak = predicted_step_peak_bytes(config, model, b,
                                             host_augment=host_augment)
        except Exception as e:
            # TPU compiles REFUSE over-HBM programs outright ("Ran out of
            # memory in memory space hbm" — possibly wrapped opaquely by
            # a remote-compile layer), so a probe-compile failure after a
            # fitting candidate means "over budget". A failure on the
            # FIRST candidate is a real error.
            if best is None:
                raise
            if logger is not None:
                logger.info(f"[autobatch] batch {b}/device: compile "
                            f"refused (over budget): {e}")
            break
        fits = peak <= cap
        if logger is not None:
            logger.info(
                f"[autobatch] batch {b}/device: predicted peak "
                f"{peak / 2**30:.2f} GiB vs budget {cap / 2**30:.2f} GiB "
                f"({'fits' if fits else 'over'})")
        if not fits:
            break
        best = b
    if best is None:
        raise MemoryError(
            f"smallest candidate batch {usable[0]} is predicted to exceed "
            f"{cap / 2**30:.2f} GiB on this device; lower the resolution, "
            f"enable --grad_accum, or pass an explicit --batch_size")
    return best * max(int(data_parallel), 1)

"""LR schedules.

``cosine_warm_restarts``: closed-form (jit-friendly, no state) equivalent of
torch CosineAnnealingWarmRestarts(T_0=20, T_mult=2, eta_min=0) stepped once
per epoch, as the reference uses (/root/reference/utils/trainer.py:42,182).
For T_mult=2 the cycle containing epoch ``e`` has index
i = floor(log2(e/T_0 + 1)), start T_0*(2^i - 1), length T_0*2^i.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warm_restarts(base_lr: float, steps_per_epoch: int,
                         t_0: int = 20, t_mult: int = 2,
                         eta_min: float = 0.0):
    """Returns an optax-compatible schedule fn: step -> lr (per-epoch
    granularity)."""
    if t_mult < 1:
        raise ValueError("t_mult must be >= 1")

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // steps_per_epoch
        if t_mult == 1:
            t_cur = jnp.mod(epoch, t_0)
            t_i = jnp.float32(t_0)
        else:
            ratio = epoch / t_0 * (t_mult - 1) + 1
            i = jnp.floor(jnp.log(ratio) / jnp.log(jnp.float32(t_mult)))
            start = t_0 * (jnp.power(jnp.float32(t_mult), i) - 1) / (t_mult - 1)
            t_i = t_0 * jnp.power(jnp.float32(t_mult), i)
            t_cur = epoch - start
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))
        return eta_min + (base_lr - eta_min) * cos

    return schedule

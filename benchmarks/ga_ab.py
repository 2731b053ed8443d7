#!/usr/bin/env python3
"""Gradient-accumulation throughput at 512² on the real TPU.

One variant per process (heap fragmentation — see CLAUDE.md):
  benchmarks/run_in_repo.sh benchmarks/ga_ab.py bs16        # one-shot
  benchmarks/run_in_repo.sh benchmarks/ga_ab.py bs32ga2     # accumulated
  benchmarks/run_in_repo.sh benchmarks/ga_ab.py bs16remat   # remat ref
  benchmarks/run_in_repo.sh benchmarks/ga_ab.py bs32remat   # remat bs32
"""

import sys
import time

import jax
import jax.numpy as jnp


def run(name, batch, grad_accum=1, remat=False, steps=8, size=512):
    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.engine import aug_config_from

    cfg = Config(batch_size=batch, image_size=size, store_size=size,
                 lr=1e-5, model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False, grad_accum=grad_accum)
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16, remat=remat)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, size, size, 1), cfg.lr,
                               steps_per_epoch=100)
    im, ma = generate_ddti_like(batch, (size, size), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, im, ma, key)
    float(m.loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, im, ma, key)
    float(m.loss)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name}: {ms:.1f} ms/step -> {batch / ms * 1e3:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "bs16"
    variants = {
        "bs16": ("bs16 ga1      512^2", dict(batch=16)),
        "bs32ga2": ("bs32 ga2      512^2", dict(batch=32, grad_accum=2)),
        "bs16remat": ("bs16 remat    512^2", dict(batch=16, remat=True)),
        "bs32remat": ("bs32 remat    512^2", dict(batch=32, remat=True)),
        "bs64ga4": ("bs64 ga4      512^2", dict(batch=64, grad_accum=4)),
    }
    name, kw = variants[which]
    run(name, **kw)

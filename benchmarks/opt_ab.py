#!/usr/bin/env python3
"""A/B the per-leaf vs flat-fused AdamW update inside the full train step
(donated, bs128/256^2 flagship). Run via benchmarks/run_in_repo.sh."""

import time

import jax
import jax.numpy as jnp


def run(fused: bool):
    import optax

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import make_train_step
    from ddti_tpu.train.engine import aug_config_from
    from ddti_tpu.train.state import TrainState, make_optimizer

    B, S = 128, 256
    cfg = Config(batch_size=B, image_size=S, store_size=S, lr=1e-5,
                 model_type="ResUNet", use_mixup=False)
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, S, S, 1), jnp.float32), train=False)
    tx, _ = make_optimizer(cfg.lr, 100, fused=fused)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                       batch_stats=v["batch_stats"],
                       opt_state=tx.init(v["params"]), tx=tx,
                       apply_fn=model.apply)
    im, ma = generate_ddti_like(B, (S, S), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, im, ma, key)
    float(m.loss)
    t0 = time.perf_counter()
    for _ in range(15):
        state, m = step(state, im, ma, key)
    float(m.loss)
    ms = (time.perf_counter() - t0) / 15 * 1e3
    print(f"fused={fused}: {ms:.1f} ms/step -> {B / ms * 1e3:.1f} img/s",
          flush=True)
    jax.tree.map(lambda a: a.delete(), state)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "leaf"):
        run(False)
    if which in ("both", "fused"):
        run(True)

#!/usr/bin/env python3
"""Capture a fresh per-op trace of the current full train step and dump the
optimized HLO so the hot fusions can be read. Writes /tmp/step_hlo.txt and
prints the top ops."""

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.core.xplane import summarize
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import ResUNet
from ddti_tpu.train import create_train_state, make_train_step
from ddti_tpu.train.engine import aug_config_from

import sys

B, S = 128, 256
FASTWARP = "fastwarp" in sys.argv[1:]
ELASTIC = "elastic" in sys.argv[1:]
CLAHE = "clahe" in sys.argv[1:]


def main():
    cfg = Config(batch_size=B, image_size=S, store_size=S, lr=1e-5,
                 model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False, aug_fast_warp=FASTWARP,
                 use_elastic=ELASTIC, use_clahe=CLAHE)
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, S, S, 1),
                               cfg.lr, steps_per_epoch=100)
    im, ma = generate_ddti_like(B, (S, S), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)

    lowered = step.lower(state, im, ma, key)
    compiled = lowered.compile()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(compiled.as_text())
    print("HLO dumped", flush=True)

    for _ in range(3):
        state, m = step(state, im, ma, key)
    float(m.loss)
    import os
    os.system("rm -rf /tmp/step_trace")
    jax.profiler.start_trace("/tmp/step_trace")
    for _ in range(3):
        state, m = step(state, im, ma, key)
    float(m.loss)
    jax.profiler.stop_trace()
    s = summarize("/tmp/step_trace", top=35)
    print("total", s["total_op_ms"])
    for r in s["ops"]:
        print(f"{r['ms'] / 3:8.2f} ms/step x{r['count'] // 3:3d}  "
              f"{r['name'][:110]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Hardware validation of train/autobatch.py: the compile-time peak-HBM
prediction must reproduce the OOM boundaries measured by running real
steps this round (step_ab.py / ga_ab.py): at 256^2 bs128 fits and bs192
OOMs; at 512^2 bs16 fits and bs32 OOMs (15.75 GB usable HBM)."""
import sys

import jax

from ddti_tpu.core import Config, enable_compilation_cache
from ddti_tpu.models import create_model
from ddti_tpu.train.autobatch import device_budget_bytes, predicted_step_peak_bytes

enable_compilation_cache("auto")
budget = device_budget_bytes()
print(f"device budget: {budget / 2**30:.2f} GiB "
      f"(platform {jax.devices()[0].platform})", flush=True)
import jax.numpy as jnp

model = create_model("ResUNet", in_channels=1, out_channels=1,
                     base_filters=64, depth=5, dtype=jnp.bfloat16)
cases = [(256, 128), (256, 192), (512, 16), (512, 32)]
if len(sys.argv) > 1:
    cases = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]
for size, bs in cases:
    cfg = Config(batch_size=bs, image_size=size, store_size=size,
                 lr=1e-5, model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False)
    try:
        peak = predicted_step_peak_bytes(cfg, model, bs)
    except Exception:
        # TPU compile refuses over-HBM programs outright; that IS the
        # "does not fit" answer (pick_batch_size handles it the same way)
        print(f"{size}^2 bs{bs}: compile refused (over HBM) -> OOM",
              flush=True)
        continue
    print(f"{size}^2 bs{bs}: predicted peak {peak / 2**30:.2f} GiB "
          f"-> {'fits' if peak <= budget else 'OOM'}", flush=True)

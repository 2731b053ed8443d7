#!/usr/bin/env python3
"""Serving-path A/B on hardware: f32 vs bf16 exported weights, batch sweep.
The serve trace (trace_serve.py) shows per-step f32 weight prefetches with
in-fusion f32->bf16 converts; bf16 export halves that traffic."""

import sys
import time

import jax
import jax.numpy as jnp

from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import ResUNet
from ddti_tpu.train import create_train_state
from ddti_tpu.train.export import aot_compile_serving, export_serving_program


def run(name, batch=128, size=256, weights_dtype=None, steps=30):
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, size, size, 1), 1e-5, steps_per_epoch=100)
    im, _ = generate_ddti_like(batch, (size, size), 0)
    im = jnp.asarray((im * 255).astype("uint8") if im.dtype != "uint8" else im)
    blob, variables = export_serving_program(
        model, state.params, state.batch_stats, batch=batch, size=size,
        fold_bn=True, input_dtype=jnp.uint8, weights_dtype=weights_dtype)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    for _ in range(3):
        p = serve(variables, im)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        p = serve(variables, im)
    int(p[0, 0, 0, 0])
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name}: {ms:.1f} ms/step -> {batch / ms * 1e3:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["f32", "bf16"]
    if "f32" in which:
        run("serve f32 weights bs128 ", 128)
    if "bf16" in which:
        run("serve bf16 weights bs128", 128, weights_dtype=jnp.bfloat16)
    if "bf16bs256" in which:
        run("serve bf16 weights bs256", 256, weights_dtype=jnp.bfloat16)
    if "bf16bs64" in which:
        run("serve bf16 weights bs64 ", 64, weights_dtype=jnp.bfloat16)

"""A/B: flagship serving throughput, bf16 (fold_bn) vs int8-quantized.

Run: benchmarks/run_in_repo.sh benchmarks/serve_int8_ab.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import ResUNet
from ddti_tpu.train import create_train_state
from ddti_tpu.train.export import (aot_compile_serving,
                                   export_serving_program)
from ddti_tpu.train.quantize import export_serving_int8

BATCH, SIZE, STEPS = 128, 256, 20


def measure(serve, variables, images, steps=STEPS):
    for _ in range(2):
        p = serve(variables, images)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    last = [serve(variables, images) for _ in range(steps)][-1]
    int(last[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    return BATCH * steps / dt, dt / steps * 1e3


def main():
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), 1e-5, steps_per_epoch=100)
    # generate_ddti_like returns uint8 [0,255] images directly
    images_u8, _ = generate_ddti_like(BATCH, (SIZE, SIZE), 0)
    images = jnp.asarray(images_u8)
    calib = images.astype(jnp.float32) / 255.0

    blob, variables = export_serving_program(
        model, state.params, state.batch_stats, batch=BATCH, size=SIZE,
        fold_bn=True, input_dtype=jnp.uint8)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    ips, ms = measure(serve, variables, images)
    print(f"bf16 fold_bn serve: {ips:8.1f} img/s  {ms:6.1f} ms/step")
    ref = serve(variables, images)

    blob_q, variables_q = export_serving_int8(
        model, state.params, state.batch_stats, batch=BATCH, size=SIZE,
        calib_images=calib)
    serve_q = aot_compile_serving(blob_q)
    variables_q = jax.device_put(variables_q)
    ips_q, ms_q = measure(serve_q, variables_q, images)
    print(f"int8 serve:         {ips_q:8.1f} img/s  {ms_q:6.1f} ms/step "
          f"({ips_q / ips:.2f}x)")
    got = serve_q(variables_q, images)
    a, b = np.asarray(ref).astype(bool), np.asarray(got).astype(bool)
    inter, union = np.logical_and(a, b).sum(), np.logical_or(a, b).sum()
    print(f"mask agreement: pixel {float((a == b).mean()):.6f}  "
          f"IoU {inter / max(union, 1):.6f}")


if __name__ == "__main__":
    main()

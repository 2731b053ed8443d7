#!/usr/bin/env python3
"""Phase breakdown of the int8 serving export on the real TPU.

Times setup / quantize_serving / export(trace+serialize) / AOT compile /
first execution separately. This is the probe that located the serving
legs' real cost (round 4): the AOT was a 0.7 s persistent-cache hit all
along — 177.6 s was quantize_serving's host-side per-conv work through
the remote-dispatch tunnel, fixed by the device-side fold + fused
calibrate/quantize (PERF_NOTES "device-side fold").

Run: benchmarks/run_in_repo.sh benchmarks/int8_breakdown.py
"""

import time

import jax
import jax.numpy as jnp

from ddti_tpu.core.compcache import enable_compilation_cache


def main() -> int:
    enable_compilation_cache("auto")

    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import create_train_state
    from ddti_tpu.train.export import aot_compile_serving
    from ddti_tpu.train.quantize import (
        export_quantized_program,
        quantize_serving,
    )

    t0 = time.time()
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64,
                    depth=5, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, 256, 256, 1), 1e-5, steps_per_epoch=100)
    images, _ = generate_ddti_like(128, (256, 256), 0)
    images = jnp.asarray(images)
    jax.tree.map(lambda a: a.delete(), state.opt_state)
    print(f"setup {time.time() - t0:.1f}", flush=True)

    t0 = time.time()
    variables = quantize_serving(
        model, state.params, state.batch_stats,
        images[:32].astype(jnp.float32) / 255.0)
    jax.block_until_ready(jax.tree.leaves(variables["quant"])[0])
    print(f"quantize_serving {time.time() - t0:.1f}", flush=True)

    t0 = time.time()
    blob = export_quantized_program(model, variables, 128, 256)
    print(f"export(trace+serialize) {time.time() - t0:.1f}", flush=True)

    t0 = time.time()
    serve = aot_compile_serving(blob)
    print(f"aot_compile {time.time() - t0:.1f}", flush=True)

    t0 = time.time()
    p = serve(jax.device_put(variables), images)
    int(p[0, 0, 0, 0])
    print(f"first_exec {time.time() - t0:.1f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python3
"""Batch sweep for the int8 serving artifact on the real TPU.

The bench's serving legs fix batch=128 (round-over-round comparability);
this probes whether a larger-batch int8 artifact serves more img/s —
serving holds only folded int8 weights + one activation set, so its HBM
ceiling is far above 128. One variant per process (fragmented-heap rule):

    benchmarks/run_in_repo.sh benchmarks/serve_int8_bs_probe.py 256
"""

import sys
import time

import jax
import jax.numpy as jnp


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    steps = 20

    from ddti_tpu.core.compcache import enable_compilation_cache
    enable_compilation_cache("auto")

    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import create_train_state
    from ddti_tpu.train.export import aot_compile_serving
    from ddti_tpu.train.quantize import export_serving_int8

    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, size, size, 1), 1e-5, steps_per_epoch=100)
    images, _ = generate_ddti_like(batch, (size, size), 0)
    images = jnp.asarray(images)
    jax.tree.map(lambda a: a.delete(), state.opt_state)

    t0 = time.perf_counter()
    blob, variables = export_serving_int8(
        model, state.params, state.batch_stats, batch=batch, size=size,
        calib_images=images[:32].astype(jnp.float32) / 255.0)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    print(f"export+aot {time.perf_counter() - t0:.1f}s", flush=True)

    for _ in range(2):
        p = serve(variables, images)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    last = [serve(variables, images) for _ in range(steps)][-1]
    int(last[0, 0, 0, 0])
    ips = batch * steps / (time.perf_counter() - t0)
    print(f"serve_int8 bs{batch} {size}^2: {ips:.1f} img/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

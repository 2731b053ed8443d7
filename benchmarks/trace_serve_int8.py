#!/usr/bin/env python3
"""Per-op trace of the INT8 serving program (train/quantize.py): locate
where the remaining ms go (quant/dequant elementwise, stem conv, s8 convs).

Run: PYTHONUNBUFFERED=1 benchmarks/run_in_repo.sh benchmarks/trace_serve_int8.py
"""

import jax
import jax.numpy as jnp

from ddti_tpu.core.xplane import summarize
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import ResUNet
from ddti_tpu.train import create_train_state

B, S = 128, 256


def main():
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, S, S, 1),
                               1e-5, steps_per_epoch=100)
    im, _ = generate_ddti_like(B, (S, S), 0)
    im = jnp.asarray(im)  # uint8 [0,255]

    from ddti_tpu.train.export import aot_compile_serving
    from ddti_tpu.train.quantize import export_serving_int8

    blob, variables = export_serving_int8(
        model, state.params, state.batch_stats, batch=B, size=S,
        calib_images=im.astype(jnp.float32) / 255.0)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)

    for _ in range(3):
        p = serve(variables, im)
    int(p[0, 0, 0, 0])
    import os
    os.system("rm -rf /tmp/serve_int8_trace")
    jax.profiler.start_trace("/tmp/serve_int8_trace")
    for _ in range(6):
        p = serve(variables, im)
    int(p[0, 0, 0, 0])
    jax.profiler.stop_trace()
    s = summarize("/tmp/serve_int8_trace", top=40)
    print("total op ms (6 steps):", s["total_op_ms"])
    for r in s["ops"]:
        print(f"{r['ms'] / 6:8.2f} ms/step x{r['count'] // 6:3d}  "
              f"{r['name'][:110]}")


if __name__ == "__main__":
    main()

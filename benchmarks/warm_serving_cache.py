"""Warm the persistent compilation cache for bench.py's serving legs.

Reproduces exactly the programs bench.py compiles in its int8 and bf16
serving sections (same model, shapes, export path, AOT compile) so a
later bench run — e.g. the driver's — hits the cache instead of paying
the 30-60 s/program remote compiles. Run via the repo-path wrapper
(scripts in benchmarks/ don't get /root/repo on sys.path, which both
the package import and the axon sitecustomize need):

    benchmarks/run_in_repo.sh benchmarks/warm_serving_cache.py [int8|bf16|both]
"""

import sys
import time

import jax
import jax.numpy as jnp

from ddti_tpu.core.compcache import enable_compilation_cache


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    batch, size = 128, 256
    enable_compilation_cache("auto")

    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import create_train_state
    from ddti_tpu.train.export import (
        aot_compile_serving,
        export_serving_program,
    )

    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, size, size, 1), 1e-5, steps_per_epoch=100)
    images, _ = generate_ddti_like(batch, (size, size), 0)
    images = jnp.asarray(images)
    jax.tree.map(lambda a: a.delete(), state.opt_state)

    if which in ("int8", "both"):
        from ddti_tpu.train.quantize import export_serving_int8

        t0 = time.perf_counter()
        blob_q, variables_q = export_serving_int8(
            model, state.params, state.batch_stats, batch=batch, size=size,
            calib_images=images[:32].astype(jnp.float32) / 255.0)
        serve_q = aot_compile_serving(blob_q)
        p = serve_q(jax.device_put(variables_q), images)
        print(f"int8 serving warm: {int(p[0, 0, 0, 0])} "
              f"in {time.perf_counter() - t0:.1f}s", flush=True)
        del serve_q, p

    if which in ("bf16", "both"):
        t0 = time.perf_counter()
        blob, variables = export_serving_program(
            model, state.params, state.batch_stats, batch=batch, size=size,
            fold_bn=True, input_dtype=jnp.uint8)
        serve = aot_compile_serving(blob)
        p = serve(jax.device_put(variables), images)
        print(f"bf16 serving warm: {int(p[0, 0, 0, 0])} "
              f"in {time.perf_counter() - t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

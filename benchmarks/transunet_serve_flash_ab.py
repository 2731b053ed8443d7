"""Serving-side flash attention A/B: TransUNet at the reference-native
512^2 (depth 3 -> 4096 bottleneck tokens, 4 layers) exported with the
Pallas flash kernels vs naive XLA attention, both AOT serving bundles
(fold_bn, uint8 in). The training-side win was 1.97x end-to-end
(transunet_flash_ab.py); this measures the deployed artifact.

Run: benchmarks/run_in_repo.sh benchmarks/transunet_serve_flash_ab.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train.export import aot_compile_serving, export_serving_program

B, S = 8, 512
imgs, _ = generate_ddti_like(B, (S, S), 0)
imgs = jnp.asarray(imgs)

for name, flash in (("naive", False), ("flash", True)):
    model = create_model("TransUNet", base_filters=64, depth=3,
                         image_size=S, dtype=jnp.bfloat16,
                         use_flash_attention=flash)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, S, S, 1)), train=False)
    blob, variables = export_serving_program(
        model, v["params"], v["batch_stats"], batch=B, size=S,
        fold_bn=True, input_dtype=jnp.uint8)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    for _ in range(2):
        p = serve(variables, imgs)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    last = [serve(variables, imgs) for _ in range(10)][-1]
    int(last[0, 0, 0, 0])
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:6s} {ms:7.1f} ms/batch  {B / ms * 1e3:6.1f} img/s",
          flush=True)
    del serve, variables

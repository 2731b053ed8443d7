"""Hardware check: a TransUNet with the Pallas flash-attention kernels
survives jax.export -> StableHLO -> AOT load -> serving (the Mosaic custom
call serializes and reloads on the TPU platform).

Run: benchmarks/run_in_repo.sh benchmarks/flash_export_check.py
Verified 2026-08-18: exported 52.7 KB program, served masks agree with the
live apply at 0.998 on an UNTRAINED net (the differing pixels sit on the
sigmoid-threshold boundary where export-path precision differs — same
phenomenon as BN folding, CLAUDE.md). Flash-enabled serving exports are
therefore safe; the auto rule (S >= 1024) applies to exports too.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train.export import aot_compile_serving, export_serving_program

model = create_model("TransUNet", base_filters=8, depth=2, image_size=64,
                     use_flash_attention=True)
v = model.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 64, 64, 1)), train=False)
blob, variables = export_serving_program(
    model, v["params"], v["batch_stats"], batch=2, size=64,
    input_dtype=jnp.uint8)
print("exported", len(blob), "bytes")
serve = aot_compile_serving(blob)
imgs, _ = generate_ddti_like(2, (64, 64), 0)
out = np.asarray(serve(jax.device_put(variables), jnp.asarray(imgs)))
print("served masks", out.shape, out.dtype)
live = model.apply({"params": v["params"], "batch_stats": v["batch_stats"]},
                   jnp.asarray(imgs, jnp.float32) / 255.0, train=False)
live_m = (jax.nn.sigmoid(live) > 0.5).astype(np.uint8)
agree = (np.asarray(live_m) == out).mean()
print("agreement vs live apply:", agree)
assert agree > 0.99, agree
print("FLASH EXPORT OK")

"""End-to-end train-step A/B: TransUNet long-sequence config with the
Pallas flash kernels (packed + exp2 + auto blocks) vs naive XLA attention.

Config: depth 2 at 256x256 -> 4096 bottleneck tokens x 4 layers, embed
256 / 8 heads (head_dim 32 -> packing G=4), bf16, batch 16.

Each variant runs in its own subprocess: after compiling/freeing one
large train program, a second program in the same process can hit a
fragmented device heap and measure 40x slow (see CLAUDE.md; bench.py
isolates its variants the same way).

Run: PYTHONUNBUFFERED=1 benchmarks/run_in_repo.sh benchmarks/transunet_flash_ab.py
"""

import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import create_train_state, make_train_step
from ddti_tpu.train.engine import aug_config_from

BATCH, SIZE, STEPS = 16, 256, 10


def measure(flash: bool) -> float:
    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=1e-5, model_type="TransUNet", use_mixup=False,
                 compute_unused_losses=False)
    model = create_model("TransUNet", base_filters=64, depth=2,
                         image_size=SIZE, use_flash_attention=flash,
                         dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=100)
    im, ma = generate_ddti_like(BATCH, (SIZE, SIZE), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    step = make_train_step(cfg, aug_config_from(cfg))
    step = lambda s, k, _step=step: _step(s, im, ma, k)  # noqa: E731
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        key, k = jax.random.split(key)
        state, m = step(state, k)
    float(m.loss)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        key, k = jax.random.split(key)
        state, m = step(state, k)
    float(m.loss)
    ips = BATCH * STEPS / (time.perf_counter() - t0)
    return ips


def run_variant(flash: bool) -> float:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, __file__, "--variant",
         "flash" if flash else "naive"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    if out.returncode != 0:
        raise RuntimeError(f"variant subprocess failed "
                           f"(rc={out.returncode}):\n{out.stderr}")
    for line in out.stdout.splitlines():
        if line.startswith("IPS "):
            return float(line.split()[1])
    raise RuntimeError(f"no 'IPS <value>' line in child stdout:\n"
                       f"{out.stdout}\n{out.stderr}")


def main():
    if "--variant" in sys.argv:
        print("IPS", measure(sys.argv[sys.argv.index("--variant") + 1]
                             == "flash"))
        return
    naive = run_variant(False)
    print(f"TransUNet d2/256^2 bs{BATCH} train, naive attention: "
          f"{naive:7.1f} img/s")
    flash = run_variant(True)
    print(f"TransUNet d2/256^2 bs{BATCH} train, flash kernels:   "
          f"{flash:7.1f} img/s ({flash / naive:.2f}x)")


if __name__ == "__main__":
    main()

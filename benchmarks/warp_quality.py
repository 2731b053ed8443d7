"""Does the fast warp change what the model LEARNS? Train the flagship
three times with identical data/seeds — exact PIL warp (default),
--aug_fast_warp (Paeth barrel, QUIRKS #23), --aug_shared_geometry
(QUIRKS #20) — and score each on the same 128 HELD-OUT synthetic images.
If the Paeth sub-pixel rounding (or the batch-shared draw) mattered, it
would show up here as an IoU gap.

Each variant runs in its own process (device-heap isolation, CLAUDE.md).

Run: benchmarks/run_in_repo.sh benchmarks/warp_quality.py
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=256)
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--n_train", type=int, default=512)
ap.add_argument("--epochs", type=int, default=10)
ap.add_argument("--variant", choices=["exact", "fastwarp", "sharedgeo"],
                default=None)
ap.add_argument("--seed", type=int, default=0,
                help="training-stream seed (data stays fixed)")
ap.add_argument("--seeds", type=int, default=3,
                help="orchestrator: runs per variant to estimate noise")
ARGS = ap.parse_args()
SIZE, BATCH = ARGS.size, ARGS.batch
N_TEST = 128
VARIANT_CFG = {
    "exact": {},
    "fastwarp": {"aug_fast_warp": True},
    "sharedgeo": {"aug_shared_geometry": True},
}


def run_variant(name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.core import enable_compilation_cache
    enable_compilation_cache("auto")  # seeds 2+ reuse the variant's program

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.engine import aug_config_from

    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=3e-4, model_type="ResUNet", use_mixup=True,
                 use_speckle=True, compute_unused_losses=False,
                 **VARIANT_CFG[name])
    from ddti_tpu.models import ResUNet
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64,
                    depth=5, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(ARGS.seed),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=ARGS.n_train // BATCH)
    tr_img, tr_mask = generate_ddti_like(ARGS.n_train, (SIZE, SIZE), 0)
    tr_img, tr_mask = jnp.asarray(tr_img), jnp.asarray(tr_mask)
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1000 + ARGS.seed)
    rng = np.random.default_rng(2000 + ARGS.seed)
    t0 = time.perf_counter()
    for e in range(ARGS.epochs):
        order = rng.permutation(ARGS.n_train)
        for s in range(ARGS.n_train // BATCH):
            idx = jnp.asarray(order[s * BATCH:(s + 1) * BATCH])
            key, k = jax.random.split(key)
            state, m = step(state, tr_img[idx], tr_mask[idx], k)
    train_s = time.perf_counter() - t0
    print(f"{name}: trained {ARGS.epochs} epochs, final loss "
          f"{float(m.loss):.4f} ({train_s:.0f}s)", file=sys.stderr)

    te_img, te_mask = generate_ddti_like(N_TEST, (SIZE, SIZE), 9)
    inter = union = 0
    per_image = []
    for i in range(0, N_TEST, BATCH):
        x = jnp.asarray(te_img[i:i + BATCH], jnp.float32) / 255.0
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        pred = np.asarray(jax.nn.sigmoid(logits) > 0.5)
        gt = np.asarray(te_mask[i:i + BATCH]) > 127
        inter += np.logical_and(pred, gt).sum()
        union += np.logical_or(pred, gt).sum()
        for p, g in zip(pred, gt):
            per_image.append(np.logical_and(p, g).sum()
                             / max(np.logical_or(p, g).sum(), 1))
    return {"variant": name, "test_iou": float(inter / max(union, 1)),
            "per_image_mean": float(np.mean(per_image)),
            "per_image_min": float(np.min(per_image))}


if __name__ == "__main__":
    if ARGS.variant:
        print(json.dumps(run_variant(ARGS.variant)))
        sys.exit(0)
    results = {}
    for name in ("exact", "fastwarp", "sharedgeo"):
        for seed in range(ARGS.seeds):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--variant", name, "--seed", str(seed),
                 "--size", str(SIZE), "--batch", str(BATCH),
                 "--n_train", str(ARGS.n_train),
                 "--epochs", str(ARGS.epochs)],
                capture_output=True, text=True, cwd="/root/repo",
                timeout=3000)
            sys.stderr.write(out.stderr)
            if out.returncode != 0:
                print(f"{name} s{seed} FAILED:\n{out.stdout}\n{out.stderr}")
                sys.exit(1)
            r = json.loads(out.stdout.strip().splitlines()[-1])
            results.setdefault(name, []).append(r["test_iou"])
            print(f"  {name} seed {seed}: IoU {r['test_iou']:.4f}",
                  flush=True)
    print(f"{'variant':10s} {'IoU mean':>9s} {'+-':>7s}  per-seed")
    for name, vals in results.items():
        print(f"{name:10s} {np.mean(vals):9.4f} {np.std(vals):7.4f}  "
              + " ".join(f"{v:.4f}" for v in vals))

"""Quality + throughput of int8 serving on a TRAINED flagship.

Trains ResUNet (bf=64, d=5, bf16) on synthetic DDTI-like data until the
logits are confident, then compares the bf16(fold_bn) and int8 serving
bundles: test IoU vs ground truth, mask agreement, and throughput.

Three phases, each in its OWN process (CLAUDE.md: a second large program
in one process can hit a fragmented device heap and measure 40x slow or
OOM — same isolation bench.py uses): the parent trains and saves the
weights, then spawns one subprocess per serving variant.

Run: benchmarks/run_in_repo.sh benchmarks/int8_quality.py \
         [--size 512 --batch 16 --min_channels 128 --remat]
(defaults: 256^2 bs128 full int8 — the deployment sweet spot; at 512^2
use --min_channels 128 per the PERF_NOTES sweep, --remat for training)
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--size", type=int, default=256)
ap.add_argument("--batch", type=int, default=128)
ap.add_argument("--min_channels", type=int, default=0)
ap.add_argument("--remat", action="store_true")
ap.add_argument("--phase", choices=["train", "bf16", "int8"], default=None,
                help="internal: run one phase in this process")
ap.add_argument("--dir", default=None, help="internal: working directory")
ARGS = ap.parse_args()
BATCH, SIZE, STEPS_TRAIN, STEPS_T = ARGS.batch, ARGS.size, 150, 20


def iou(pred, gt):
    pred = np.asarray(pred).astype(bool)
    gt = np.asarray(gt).astype(bool)
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    return inter / max(union, 1)


def _model():
    import jax.numpy as jnp

    from ddti_tpu.models import ResUNet
    return ResUNet(in_channels=1, out_channels=1, base_filters=64,
                   depth=5, dtype=jnp.bfloat16, remat=ARGS.remat)


def phase_train(workdir: str) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.checkpoint import save_params_npz
    from ddti_tpu.train.engine import aug_config_from

    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=3e-4, model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False)
    model = _model()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=100)
    tr_img, tr_mask = generate_ddti_like(BATCH, (SIZE, SIZE), 0)
    tr_img = jnp.asarray(tr_img)
    tr_mask_j = jnp.asarray(tr_mask)

    train_step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(STEPS_TRAIN):
        key, k = jax.random.split(key)
        state, m = train_step(state, tr_img, tr_mask_j, k)
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {float(m.loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)")
    save_params_npz(os.path.join(workdir, "trained.npz"),
                    state.params, state.batch_stats)
    # serve the TRAINING images (saved for the serve phases): the model is
    # confident there (memorized), so the masks are non-trivial and the
    # f32-vs-int8 comparison is meaningful; held-out synthetic images get
    # near-empty predictions. generate_ddti_like returns uint8 [0,255].
    np.save(os.path.join(workdir, "images.npy"), np.asarray(tr_img))
    np.save(os.path.join(workdir, "masks.npy"), np.asarray(tr_mask))


def phase_serve(workdir: str, variant: str) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.train.checkpoint import load_params_npz
    from ddti_tpu.train.export import (aot_compile_serving,
                                       export_serving_program)
    from ddti_tpu.train.quantize import export_serving_int8

    model = _model()
    # template trees for the npz loader (shapes/dtypes from a tiny init)
    tv = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, SIZE, SIZE, 1)), train=False))
    params, batch_stats = load_params_npz(
        os.path.join(workdir, "trained.npz"),
        tv["params"], tv["batch_stats"])
    images_u8 = jnp.asarray(np.load(os.path.join(workdir, "images.npy")))

    if variant == "bf16":
        blob, variables = export_serving_program(
            model, params, batch_stats, batch=BATCH, size=SIZE,
            fold_bn=True, input_dtype=jnp.uint8)
    else:
        calib = images_u8.astype(jnp.float32) / 255.0
        blob, variables = export_serving_int8(
            model, params, batch_stats, batch=BATCH, size=SIZE,
            calib_images=calib, min_channels=ARGS.min_channels)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)

    for _ in range(2):
        p = serve(variables, images_u8)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    last = [serve(variables, images_u8) for _ in range(STEPS_T)][-1]
    int(last[0, 0, 0, 0])
    ips = BATCH * STEPS_T / (time.perf_counter() - t0)

    np.save(os.path.join(workdir, f"pred_{variant}.npy"),
            np.asarray(serve(variables, images_u8)))
    print("IPS", ips)


def run_phase(workdir: str, phase: str) -> float | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    args = [sys.executable, __file__, "--phase", phase, "--dir", workdir,
            "--size", str(SIZE), "--batch", str(BATCH),
            "--min_channels", str(ARGS.min_channels)]
    if ARGS.remat:
        args.append("--remat")
    out = subprocess.run(args, capture_output=True, text=True,
                         cwd="/root/repo", env=env)
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        raise RuntimeError(f"phase {phase} failed (rc={out.returncode}):\n"
                           f"{out.stderr}")
    for line in out.stdout.splitlines():
        if line.startswith("IPS "):
            return float(line.split()[1])
    return None


def main():
    if ARGS.phase:
        if ARGS.phase == "train":
            phase_train(ARGS.dir)
        else:
            phase_serve(ARGS.dir, ARGS.phase)
        return

    with tempfile.TemporaryDirectory(prefix="int8q_") as workdir:
        run_phase(workdir, "train")
        ips_f = run_phase(workdir, "bf16")
        ips_q = run_phase(workdir, "int8")
        gt = np.load(os.path.join(workdir, "masks.npy"))
        ref = np.load(os.path.join(workdir, "pred_bf16.npy"))
        got = np.load(os.path.join(workdir, "pred_int8.npy"))

    mc = f" mc={ARGS.min_channels}" if ARGS.min_channels else ""
    print(f"[{SIZE}^2 bs{BATCH}{mc}]")
    print(f"bf16 fold_bn: {ips_f:8.1f} img/s   test IoU {iou(ref, gt):.4f}")
    print(f"int8:         {ips_q:8.1f} img/s   test IoU {iou(got, gt):.4f}"
          f"   ({ips_q / ips_f:.2f}x)")
    a, b = ref.astype(bool), got.astype(bool)
    inter, union = np.logical_and(a, b).sum(), np.logical_or(a, b).sum()
    print(f"mask agreement: pixel {float((a == b).mean()):.6f}  "
          f"IoU {inter / max(union, 1):.6f}  pos_f {a.mean():.4f} "
          f"pos_q {b.mean():.4f}")


if __name__ == "__main__":
    main()

"""Quality + cost of flip-TTA serving on a TRAINED flagship.

Unlike int8_quality.py (which overfits one batch to get confident masks),
TTA only matters where predictions are imperfect, so this trains ResUNet
on a larger synthetic set for several epochs and evaluates on HELD-OUT
images: test IoU and serving throughput of the plain vs TTA-baked
serving bundle (both fold_bn, uint8-in, AOT-compiled).

Each phase runs in its own process (device-heap isolation, CLAUDE.md).

Run: benchmarks/run_in_repo.sh benchmarks/tta_quality.py
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
ap.add_argument("--batch", type=int, default=64)
ap.add_argument("--n_train", type=int, default=512)
ap.add_argument("--epochs", type=int, default=10)
ap.add_argument("--phase", choices=["train", "plain", "tta", "int8tta"],
                default=None)
ap.add_argument("--dir", default=None)
ARGS = ap.parse_args()
SIZE, BATCH, STEPS_T = ARGS.size, ARGS.batch, 10
N_TEST = 128
assert ARGS.n_train >= ARGS.batch, "--n_train must be >= --batch"


def iou(pred, gt):
    pred = np.asarray(pred).astype(bool)
    gt = np.asarray(gt).astype(bool)
    return np.logical_and(pred, gt).sum() / max(
        np.logical_or(pred, gt).sum(), 1)


def _model():
    import jax.numpy as jnp

    from ddti_tpu.models import ResUNet
    return ResUNet(in_channels=1, out_channels=1, base_filters=64,
                   depth=5, dtype=jnp.bfloat16)


def phase_train(workdir: str) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.checkpoint import save_params_npz
    from ddti_tpu.train.engine import aug_config_from

    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=3e-4, model_type="ResUNet", use_mixup=True,
                 use_speckle=True, compute_unused_losses=False)
    model = _model()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=ARGS.n_train // BATCH)
    tr_img, tr_mask = generate_ddti_like(ARGS.n_train, (SIZE, SIZE), 0)
    tr_img, tr_mask = jnp.asarray(tr_img), jnp.asarray(tr_mask)

    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(2)
    t0 = time.perf_counter()
    for e in range(ARGS.epochs):
        order = rng.permutation(ARGS.n_train)
        for s in range(ARGS.n_train // BATCH):
            idx = jnp.asarray(order[s * BATCH:(s + 1) * BATCH])
            key, k = jax.random.split(key)
            state, m = step(state, tr_img[idx], tr_mask[idx], k)
        print(f"epoch {e + 1}: loss {float(m.loss):.4f} "
              f"({time.perf_counter() - t0:.0f}s)")
    save_params_npz(os.path.join(workdir, "trained.npz"),
                    state.params, state.batch_stats)
    te_img, te_mask = generate_ddti_like(N_TEST, (SIZE, SIZE), 9)
    np.save(os.path.join(workdir, "images.npy"), np.asarray(te_img))
    np.save(os.path.join(workdir, "masks.npy"), np.asarray(te_mask))


def phase_serve(workdir: str, variant: str) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.train.checkpoint import load_params_npz
    from ddti_tpu.train.export import (aot_compile_serving,
                                       export_serving_program)

    model = _model()
    tv = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, SIZE, SIZE, 1)), train=False))
    params, batch_stats = load_params_npz(
        os.path.join(workdir, "trained.npz"),
        tv["params"], tv["batch_stats"])
    images = np.load(os.path.join(workdir, "images.npy"))

    if variant == "int8tta":
        from ddti_tpu.data import generate_ddti_like
        from ddti_tpu.train.quantize import export_serving_int8

        # calibrate on TRAIN-distribution frames (seed 0 = phase_train's
        # set), never on the held-out test images being scored — mirrors
        # the product path (Trainer._calibration_batch uses VAL)
        cal_img, _ = generate_ddti_like(32, (SIZE, SIZE), 0)
        calib = jnp.asarray(cal_img).astype(jnp.float32) / 255.0
        blob, variables = export_serving_int8(
            model, params, batch_stats, batch=BATCH, size=SIZE,
            calib_images=calib, tta=True)
    else:
        blob, variables = export_serving_program(
            model, params, batch_stats, batch=BATCH, size=SIZE,
            fold_bn=True, input_dtype=jnp.uint8, tta=(variant == "tta"))
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)

    x0 = jnp.asarray(images[:BATCH])
    for _ in range(2):
        p = serve(variables, x0)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    last = [serve(variables, x0) for _ in range(STEPS_T)][-1]
    int(last[0, 0, 0, 0])
    print("IPS", BATCH * STEPS_T / (time.perf_counter() - t0))

    preds = np.concatenate([
        np.asarray(serve(variables, jnp.asarray(images[i:i + BATCH])))
        for i in range(0, N_TEST, BATCH)])
    np.save(os.path.join(workdir, f"pred_{variant}.npy"), preds)


def run_phase(workdir: str, phase: str) -> float | None:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    args = [sys.executable, __file__, "--phase", phase, "--dir", workdir,
            "--size", str(SIZE), "--batch", str(BATCH),
            "--n_train", str(ARGS.n_train), "--epochs", str(ARGS.epochs)]
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

    with tempfile.TemporaryDirectory(prefix="ttaq_") as workdir:
        run_phase(workdir, "train")
        ips_p = run_phase(workdir, "plain")
        ips_t = run_phase(workdir, "tta")
        ips_q = run_phase(workdir, "int8tta")
        gt = np.load(os.path.join(workdir, "masks.npy"))
        plain = np.load(os.path.join(workdir, "pred_plain.npy"))
        tta = np.load(os.path.join(workdir, "pred_tta.npy"))
        qtta = np.load(os.path.join(workdir, "pred_int8tta.npy"))

    print(f"[{SIZE}^2 bs{BATCH}, {N_TEST} held-out images]")
    print(f"plain:    {ips_p:8.1f} img/s   test IoU {iou(plain, gt):.4f}")
    print(f"tta:      {ips_t:8.1f} img/s   test IoU {iou(tta, gt):.4f}"
          f"   ({ips_t / ips_p:.2f}x throughput)")
    print(f"int8+tta: {ips_q:8.1f} img/s   test IoU {iou(qtta, gt):.4f}"
          f"   ({ips_q / ips_t:.2f}x vs bf16 tta)")
    # per-image IoU deltas: where does the ensemble help/hurt?
    deltas = [iou(tta[i], gt[i]) - iou(plain[i], gt[i])
              for i in range(N_TEST)]
    print(f"per-image IoU delta: mean {np.mean(deltas):+.4f}  "
          f"median {np.median(deltas):+.4f}  helped "
          f"{sum(d > 0 for d in deltas)}/{N_TEST}")


if __name__ == "__main__":
    main()

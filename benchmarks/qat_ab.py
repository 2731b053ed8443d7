#!/usr/bin/env python3
"""Quantization-aware training A/B on the real TPU (train/qat.py).

Measures, flagship ResUNet (bf=64 d=5, bf16) on synthetic DDTI-like data:
  1. the --qat train-step cost vs the float step (same config otherwise);
  2. int8 serving quality from each arm — float weights + one-batch PTQ
     calibration vs QAT weights + EMA-learned ranges — each against its
     own bf16 serving baseline and the ground truth.

Phases run in their own processes (CLAUDE.md: a second large program in
one process can hit a fragmented device heap), mirroring int8_quality.py.

Run: benchmarks/run_in_repo.sh benchmarks/qat_ab.py [--size 256 --batch 128]
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
ap.add_argument("--steps_train", type=int, default=150)
ap.add_argument("--phase", default=None,
                choices=["train_float", "train_qat", "bf16_float",
                         "bf16_qat", "int8_ptq", "int8_qat"],
                help="internal: run one phase in this process")
ap.add_argument("--dir", default=None, help="internal: working directory")
ARGS = ap.parse_args()
BATCH, SIZE, STEPS_T = ARGS.batch, ARGS.size, 20


def iou(pred, gt):
    pred = np.asarray(pred).astype(bool)
    gt = np.asarray(gt).astype(bool)
    return (np.logical_and(pred, gt).sum()
            / max(np.logical_or(pred, gt).sum(), 1))


def _model():
    import jax.numpy as jnp

    from ddti_tpu.models import ResUNet
    return ResUNet(in_channels=1, out_channels=1, base_filters=64,
                   depth=5, dtype=jnp.bfloat16)


def phase_train(workdir: str, qat: bool) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.checkpoint import save_params_npz
    from ddti_tpu.train.engine import aug_config_from

    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=3e-4, model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False, qat=qat)
    model = _model()
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=100, qat=qat)
    tr_img, tr_mask = generate_ddti_like(BATCH, (SIZE, SIZE), 0)
    tr_img, tr_mask_j = jnp.asarray(tr_img), jnp.asarray(tr_mask)

    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    # timed window after warmup (same protocol as step_ab.py)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, m = step(state, tr_img, tr_mask_j, k)
    float(m.loss)
    t0 = time.perf_counter()
    for _ in range(12):
        key, k = jax.random.split(key)
        state, m = step(state, tr_img, tr_mask_j, k)
    float(m.loss)
    ms = (time.perf_counter() - t0) / 12 * 1e3
    print(f"MS {ms:.1f}")
    for i in range(15, ARGS.steps_train):
        key, k = jax.random.split(key)
        state, m = step(state, tr_img, tr_mask_j, k)
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {float(m.loss):.4f}")
    tag = "qat" if qat else "float"
    save_params_npz(os.path.join(workdir, f"trained_{tag}.npz"),
                    state.params, state.batch_stats,
                    qstats=(jax.device_get(state.qstats) if qat else None))
    if not os.path.exists(os.path.join(workdir, "images.npy")):
        np.save(os.path.join(workdir, "images.npy"), np.asarray(tr_img))
        np.save(os.path.join(workdir, "masks.npy"), np.asarray(tr_mask))


def phase_serve(workdir: str, phase: str) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.train.checkpoint import load_params_npz, load_qstats
    from ddti_tpu.train.export import (aot_compile_serving,
                                       export_serving_program)
    from ddti_tpu.train.quantize import export_serving_int8

    arm = "qat" if phase.endswith("qat") else "float"
    ck = os.path.join(workdir, f"trained_{arm}.npz")
    model = _model()
    tv = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, SIZE, SIZE, 1)), train=False))
    params, batch_stats = load_params_npz(ck, tv["params"],
                                          tv["batch_stats"])
    images_u8 = jnp.asarray(np.load(os.path.join(workdir, "images.npy")))

    if phase.startswith("bf16"):
        blob, variables = export_serving_program(
            model, params, batch_stats, batch=BATCH, size=SIZE,
            fold_bn=True, input_dtype=jnp.uint8)
    elif phase == "int8_ptq":
        calib = images_u8.astype(jnp.float32) / 255.0
        blob, variables = export_serving_int8(
            model, params, batch_stats, batch=BATCH, size=SIZE,
            calib_images=calib)
    else:  # int8_qat: EMA-learned ranges, no calibration batch
        qs = load_qstats(ck)
        assert qs, "QAT checkpoint carries no qstats"
        amax = {tuple(p.split("/")): v for p, v in qs.items() if v > 0}
        blob, variables = export_serving_int8(
            model, params, batch_stats, batch=BATCH, size=SIZE,
            amax=amax)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    for _ in range(2):
        p = serve(variables, images_u8)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    last = [serve(variables, images_u8) for _ in range(STEPS_T)][-1]
    int(last[0, 0, 0, 0])
    ips = BATCH * STEPS_T / (time.perf_counter() - t0)
    np.save(os.path.join(workdir, f"pred_{phase}.npy"),
            np.asarray(serve(variables, images_u8)))
    print(f"IPS {ips:.1f}")


def run_phase(workdir: str, phase: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    args = [sys.executable, __file__, "--phase", phase, "--dir", workdir,
            "--size", str(SIZE), "--batch", str(BATCH),
            "--steps_train", str(ARGS.steps_train)]
    out = subprocess.run(args, capture_output=True, text=True,
                         cwd="/root/repo", env=env)
    sys.stdout.write(out.stdout)
    if out.returncode != 0:
        raise RuntimeError(f"phase {phase} failed (rc={out.returncode}):\n"
                           f"{out.stderr[-3000:]}")
    res = {}
    for line in out.stdout.splitlines():
        if line.startswith(("IPS ", "MS ")):
            k, v = line.split()
            res[k] = float(v)
    return res


def main():
    if ARGS.phase:
        if ARGS.phase.startswith("train"):
            phase_train(ARGS.dir, qat=ARGS.phase == "train_qat")
        else:
            phase_serve(ARGS.dir, ARGS.phase)
        return

    with tempfile.TemporaryDirectory(prefix="qatab_") as wd:
        tf = run_phase(wd, "train_float")
        tq = run_phase(wd, "train_qat")
        r = {p: run_phase(wd, p) for p in
             ("bf16_float", "int8_ptq", "bf16_qat", "int8_qat")}
        gt = np.load(os.path.join(wd, "masks.npy"))
        pred = {p: np.load(os.path.join(wd, f"pred_{p}.npy"))
                for p in r}

    print(f"\n[{SIZE}^2 bs{BATCH}, {ARGS.steps_train} train steps]")
    print(f"train step: float {tf['MS']:.1f} ms  ->  QAT {tq['MS']:.1f} ms "
          f"({tq['MS'] / tf['MS']:.2f}x cost)")
    for arm in ("float", "qat"):
        b, q = pred[f"bf16_{arm}"], pred[
            "int8_ptq" if arm == "float" else "int8_qat"]
        a, c = b.astype(bool), q.astype(bool)
        agree = (np.logical_and(a, c).sum()
                 / max(np.logical_or(a, c).sum(), 1))
        print(f"{arm:5s}: bf16 IoU {iou(b, gt):.4f}  int8 IoU "
              f"{iou(q, gt):.4f}  int8-vs-bf16 mask IoU {agree:.6f}  "
              f"int8 {r['int8_ptq' if arm == 'float' else 'int8_qat']['IPS']:.0f} img/s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Knowledge-distillation A/B on the real TPU (train/distill.py).

Flagship ResUNet (bf=64 d=5) teacher -> small ResUNet student, synthetic
DDTI-like data, data-limited regime (the setting where KD has signal).
Measures:
  1. the --distill train-step cost vs the plain student step (the added
     frozen teacher forward);
  2. held-out quality: plain-trained student vs distilled student vs the
     teacher itself;
  3. serving throughput: student vs teacher bf16 fold_bn bundles (the
     motivation — a small student outserves any quantization of the big
     model).

Phases run in their own processes (CLAUDE.md: device-heap fragmentation),
mirroring qat_ab.py.

Run: benchmarks/run_in_repo.sh benchmarks/distill_ab.py
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
ap.add_argument("--train_n", type=int, default=64,
                help="training images (small on purpose: KD's regime)")
ap.add_argument("--test_n", type=int, default=128)
ap.add_argument("--steps_teacher", type=int, default=150)
ap.add_argument("--steps_student", type=int, default=100)
ap.add_argument("--student_bf", type=int, default=16)
ap.add_argument("--student_depth", type=int, default=4)
ap.add_argument("--phase", default=None,
                choices=["train_teacher", "train_plain", "train_distill",
                         "serve_teacher", "serve_plain", "serve_distill"])
ap.add_argument("--dir", default=None)
ARGS = ap.parse_args()
SIZE, BATCH = ARGS.size, ARGS.batch
STEPS_SERVE = 20


def iou(pred, gt):
    pred, gt = np.asarray(pred).astype(bool), np.asarray(gt).astype(bool)
    return (np.logical_and(pred, gt).sum()
            / max(np.logical_or(pred, gt).sum(), 1))


def _model(teacher: bool):
    import jax.numpy as jnp

    from ddti_tpu.models import ResUNet
    if teacher:
        return ResUNet(in_channels=1, out_channels=1, base_filters=64,
                       depth=5, dtype=jnp.bfloat16)
    return ResUNet(in_channels=1, out_channels=1,
                   base_filters=ARGS.student_bf, depth=ARGS.student_depth,
                   dtype=jnp.bfloat16)


def _data(workdir):
    import jax.numpy as jnp

    from ddti_tpu.data import generate_ddti_like
    tr_img, tr_mask = generate_ddti_like(ARGS.train_n, (SIZE, SIZE), 0)
    if not os.path.exists(os.path.join(workdir, "test_images.npy")):
        te_img, te_mask = generate_ddti_like(ARGS.test_n, (SIZE, SIZE), 999)
        np.save(os.path.join(workdir, "test_images.npy"),
                np.asarray(te_img))
        np.save(os.path.join(workdir, "test_masks.npy"),
                np.asarray(te_mask))
    return jnp.asarray(tr_img), jnp.asarray(tr_mask)


def phase_train(workdir: str, phase: str) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.core import Config
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.checkpoint import save_params_npz
    from ddti_tpu.train.engine import aug_config_from

    teacher = phase == "train_teacher"
    distill = phase == "train_distill"
    steps = ARGS.steps_teacher if teacher else ARGS.steps_student
    kw = {}
    if distill:
        kw = dict(distill_checkpoint=os.path.join(workdir, "teacher.npz"),
                  distill_base_filters=64, distill_depth=5,
                  distill_weight=0.5, distill_temperature=2.0)
    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=3e-4, model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False, **kw)
    model = _model(teacher)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=100)
    tr_img, tr_mask = _data(workdir)

    tvars = None
    t_apply = None
    if distill:
        from ddti_tpu.train.distill import teacher_from_config
        cfg.model_kwargs = dict(base_filters=ARGS.student_bf,
                                depth=ARGS.student_depth)
        t_apply, tvars = teacher_from_config(cfg)
        tvars = jax.device_put(tvars)
    step = make_train_step(cfg, aug_config_from(cfg), teacher_apply=t_apply)

    def one(state, key):
        k = jax.random.fold_in(key, 0)
        # sample a batch with wraparound (train_n < BATCH is fine)
        idx = jax.random.randint(k, (BATCH,), 0, tr_img.shape[0])
        if distill:
            return step(state, tr_img[idx], tr_mask[idx], k, tvars)
        return step(state, tr_img[idx], tr_mask[idx], k)

    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        state, m = one(state, k)
    float(m.loss)
    t0 = time.perf_counter()
    for i in range(12):
        key, k = jax.random.split(key)
        state, m = one(state, k)
    float(m.loss)
    print(f"MS {(time.perf_counter() - t0) / 12 * 1e3:.1f}")
    for i in range(15, steps):
        key, k = jax.random.split(key)
        state, m = one(state, k)
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {float(m.loss):.4f}")
    tag = {"train_teacher": "teacher", "train_plain": "plain",
           "train_distill": "distill"}[phase]
    save_params_npz(os.path.join(workdir, f"{tag}.npz"),
                    jax.device_get(state.params),
                    jax.device_get(state.batch_stats))


def phase_serve(workdir: str, phase: str) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.train.checkpoint import load_params_npz
    from ddti_tpu.train.export import (aot_compile_serving,
                                       export_serving_program)

    tag = phase.split("_")[1]
    teacher = tag == "teacher"
    model = _model(teacher)
    tv = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, SIZE, SIZE, 1)), train=False))
    params, stats = load_params_npz(
        os.path.join(workdir, f"{tag}.npz"), tv["params"],
        tv["batch_stats"])
    te_img = np.load(os.path.join(workdir, "test_images.npy"))

    blob, variables = export_serving_program(
        model, params, stats, batch=BATCH, size=SIZE, fold_bn=True,
        input_dtype=jnp.uint8)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    batches = [jnp.asarray(te_img[i:i + BATCH]) for i
               in range(0, len(te_img) - BATCH + 1, BATCH)]
    preds = []
    for b in batches:  # warmup pass doubles as the scored pass
        preds.append(np.asarray(serve(variables, b)))
    t0 = time.perf_counter()
    for _ in range(STEPS_SERVE):
        p = serve(variables, batches[0])
    int(p[0, 0, 0, 0])
    ips = BATCH * STEPS_SERVE / (time.perf_counter() - t0)
    np.save(os.path.join(workdir, f"pred_{tag}.npy"),
            np.concatenate(preds, axis=0))
    print(f"IPS {ips:.1f}")


def run_phase(workdir: str, phase: str) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    args = [sys.executable, __file__, "--phase", phase, "--dir", workdir,
            "--size", str(SIZE), "--batch", str(BATCH),
            "--train_n", str(ARGS.train_n), "--test_n", str(ARGS.test_n),
            "--steps_teacher", str(ARGS.steps_teacher),
            "--steps_student", str(ARGS.steps_student),
            "--student_bf", str(ARGS.student_bf),
            "--student_depth", str(ARGS.student_depth)]
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
            phase_train(ARGS.dir, ARGS.phase)
        else:
            phase_serve(ARGS.dir, ARGS.phase)
        return

    with tempfile.TemporaryDirectory(prefix="kdab_") as wd:
        r = {}
        for p in ("train_teacher", "train_plain", "train_distill",
                  "serve_teacher", "serve_plain", "serve_distill"):
            r[p] = run_phase(wd, p)
        gt = np.load(os.path.join(wd, "test_masks.npy"))
        n = (len(gt) // BATCH) * BATCH
        gt = gt[:n]
        pred = {t: np.load(os.path.join(wd, f"pred_{t}.npy"))
                for t in ("teacher", "plain", "distill")}

    print(f"\n[{SIZE}^2 bs{BATCH}, train_n={ARGS.train_n}, "
          f"student bf={ARGS.student_bf} d={ARGS.student_depth}, "
          f"{ARGS.steps_student} student steps]")
    print(f"student step: plain {r['train_plain']['MS']:.1f} ms -> "
          f"distill {r['train_distill']['MS']:.1f} ms "
          f"({r['train_distill']['MS'] / r['train_plain']['MS']:.2f}x, "
          f"teacher fwd fused)")
    for t in ("teacher", "plain", "distill"):
        print(f"{t:8s}: held-out IoU {iou(pred[t], gt):.4f}  "
              f"serve {r['serve_' + t]['IPS']:.0f} img/s")
    print(f"student serves "
          f"{r['serve_plain']['IPS'] / r['serve_teacher']['IPS']:.2f}x "
          f"the teacher")


if __name__ == "__main__":
    main()

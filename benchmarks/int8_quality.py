"""Quality + throughput of int8 serving on a TRAINED flagship.

Trains ResUNet (bf=64, d=5, bf16) on synthetic DDTI-like data until the
logits are confident, then compares the bf16(fold_bn) and int8 serving
bundles: test IoU vs ground truth, mask agreement, and throughput.

Run: benchmarks/run_in_repo.sh benchmarks/int8_quality.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ddti_tpu.core import Config
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import ResUNet
from ddti_tpu.train import create_train_state, make_train_step
from ddti_tpu.train.engine import aug_config_from
from ddti_tpu.train.export import (aot_compile_serving,
                                   export_serving_program)
from ddti_tpu.train.quantize import export_serving_int8

BATCH, SIZE, STEPS_TRAIN, STEPS_T = 128, 256, 150, 20


def iou(pred, gt):
    pred = np.asarray(pred).astype(bool)
    gt = np.asarray(gt).astype(bool)
    inter = np.logical_and(pred, gt).sum()
    union = np.logical_or(pred, gt).sum()
    return inter / max(union, 1)


def measure(serve, variables, images, steps=STEPS_T):
    for _ in range(2):
        p = serve(variables, images)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    last = [serve(variables, images) for _ in range(steps)][-1]
    int(last[0, 0, 0, 0])
    return BATCH * steps / (time.perf_counter() - t0)


def main():
    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=3e-4, model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False)
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=100)
    tr_img, tr_mask = generate_ddti_like(BATCH, (SIZE, SIZE), 0)
    te_img, te_mask = generate_ddti_like(BATCH, (SIZE, SIZE), 99)
    tr_img, tr_mask = jnp.asarray(tr_img), jnp.asarray(tr_mask)

    train_step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    for i in range(STEPS_TRAIN):
        key, k = jax.random.split(key)
        state, m = train_step(state, tr_img, tr_mask, k)
        if (i + 1) % 50 == 0:
            print(f"step {i + 1}: loss {float(m.loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)")

    # serve the TRAINING images: the model is confident there (memorized),
    # so the masks are non-trivial and the f32-vs-int8 comparison is
    # meaningful; held-out synthetic images get near-empty predictions.
    # generate_ddti_like returns uint8 [0,255] directly.
    del te_img
    images_u8 = tr_img
    te_mask = tr_mask
    calib = tr_img.astype(jnp.float32) / 255.0

    blob, variables = export_serving_program(
        model, state.params, state.batch_stats, batch=BATCH, size=SIZE,
        fold_bn=True, input_dtype=jnp.uint8)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    ref = np.asarray(serve(variables, images_u8))
    ips_f = measure(serve, variables, images_u8)

    blob_q, variables_q = export_serving_int8(
        model, state.params, state.batch_stats, batch=BATCH, size=SIZE,
        calib_images=calib)
    serve_q = aot_compile_serving(blob_q)
    variables_q = jax.device_put(variables_q)
    got = np.asarray(serve_q(variables_q, images_u8))
    ips_q = measure(serve_q, variables_q, images_u8)

    print(f"bf16 fold_bn: {ips_f:8.1f} img/s   test IoU {iou(ref, te_mask):.4f}")
    print(f"int8:         {ips_q:8.1f} img/s   test IoU {iou(got, te_mask):.4f}"
          f"   ({ips_q / ips_f:.2f}x)")
    a, b = ref.astype(bool), got.astype(bool)
    inter, union = np.logical_and(a, b).sum(), np.logical_or(a, b).sum()
    print(f"mask agreement: pixel {float((a == b).mean()):.6f}  "
          f"IoU {inter / max(union, 1):.6f}  pos_f {a.mean():.4f} "
          f"pos_q {b.mean():.4f}")


if __name__ == "__main__":
    main()

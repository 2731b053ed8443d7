#!/usr/bin/env python3
"""A/B full-train-step variants on the real TPU: integrated v1 warp +
production loss path as the new base, then remat and batch-size sweeps.
Each variant is its own donated-step program; state is freed between."""

import sys
import time

import jax
import jax.numpy as jnp


def run(name, batch=128, remat=False, steps=12, size=256, freeze=(),
        **cfg_extra):
    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.engine import aug_config_from

    S = size
    base = dict(batch_size=batch, image_size=S, store_size=S, lr=1e-5,
                model_type="ResUNet", use_mixup=False,
                compute_unused_losses=False)
    base.update(cfg_extra)
    cfg = Config(**base)
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16, remat=remat)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, S, S, 1),
                               cfg.lr, steps_per_epoch=100, freeze=freeze)
    im, ma = generate_ddti_like(batch, (S, S), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        state, m = step(state, im, ma, key)
    float(m.loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, im, ma, key)
    float(m.loss)
    ms = (time.perf_counter() - t0) / steps * 1e3
    print(f"{name}: {ms:.1f} ms/step -> {batch / ms * 1e3:.1f} img/s",
          flush=True)
    jax.tree.map(lambda a: a.delete(), state)


if __name__ == "__main__":
    which = sys.argv[1:] or ["base", "remat", "bs64", "bs96", "bs192"]
    if "base" in which:
        run("base bs128          ", 128)
    if "remat" in which:
        run("remat bs128         ", 128, remat=True)
    if "bs64" in which:
        run("bs64                ", 64)
    if "bs96" in which:
        run("bs96                ", 96)
    if "bs192" in which:
        run("bs192               ", 192)
    if "shared" in which:
        run("shared-geometry bs128", 128, aug_shared_geometry=True)
    if "bs256remat" in which:
        run("bs256 + remat       ", 256, remat=True)
    if "fastwarp" in which:
        run("fast-warp bs128     ", 128, aug_fast_warp=True)
    if "elastic" in which:
        run("elastic bs128       ", 128, use_elastic=True)
    if "elasticfw" in which:
        run("elastic+fastwarp    ", 128, use_elastic=True,
            aug_fast_warp=True)
    if "speckle" in which:
        run("speckle bs128       ", 128, use_speckle=True)
    if "tgc" in which:
        run("tgc bs128           ", 128, use_tgc=True)
    if "clahe" in which:
        run("clahe bs128         ", 128, use_clahe=True)
    if "mixup" in which:
        run("mixup bs128         ", 128, use_mixup=True)
    if "allon" in which:
        run("all-aug bs128       ", 128, use_speckle=True, use_tgc=True,
            use_clahe=True, use_mixup=True)
    if "allonfw" in which:
        run("all-aug+fastwarp    ", 128, use_speckle=True, use_tgc=True,
            use_clahe=True, use_mixup=True, aug_fast_warp=True)
    if "nanguard" in which:
        run("nan-guard bs128     ", 128, nan_guard=True)
    if "nanguardclip" in which:
        run("nan-guard+clip bs128", 128, nan_guard=True, clip_grad_norm=1.0)
    if "ga512fw" in which:
        run("bs32 ga2+fw 512^2   ", 32, size=512, grad_accum=2,
            aug_fast_warp=True)
    if "base512" in which:
        run("base bs16 512^2     ", 16, size=512)
    if "fastwarp512" in which:
        run("fast-warp bs16 512^2", 16, size=512, aug_fast_warp=True)
    if "freeze" in which:
        # fine-tune mode: encoder+bottleneck frozen -> XLA can DCE their
        # wgrad convs AND the whole encoder backward chain (nothing
        # upstream of them is trainable)
        run("freeze enc+bottleneck", 128,
            freeze=("encoders", "bottleneck"))

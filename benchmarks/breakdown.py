#!/usr/bin/env python3
"""Train-step timing breakdown + per-op profile on the real TPU.

Times the components of the flagship train step (ResUNet bf=64 d=5, bf16,
bs128 @ 256x256) as separate jitted programs, then captures a jax.profiler
trace of the full step and reports the top HLO ops by self time (parsed from
the xplane protobuf via tensorboard_plugin_profile).

Writes benchmarks/breakdown.json. Run from /root/repo (sitecustomize).
"""

from __future__ import annotations


import json
import os
import time

BATCH = 128
SIZE = 256
STEPS = 10
WARMUP = 2


def _time(fn, sync, steps=STEPS, warmup=WARMUP):
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.data.augment import augment_batch, mixup
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train import create_train_state, make_train_step
    from ddti_tpu.train.engine import aug_config_from
    from ddti_tpu.losses import weighted_loss

    cfg = Config(batch_size=BATCH, image_size=SIZE, store_size=SIZE,
                 lr=1e-5, model_type="ResUNet", use_mixup=False)
    aug_cfg = aug_config_from(cfg)
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64, depth=5,
                    dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, SIZE, SIZE, 1), cfg.lr,
                               steps_per_epoch=100)
    images_u8, masks_u8 = generate_ddti_like(BATCH, (SIZE, SIZE), 0)
    images_u8 = jnp.asarray(images_u8)
    masks_u8 = jnp.asarray(masks_u8)
    key = jax.random.PRNGKey(1)
    loss_kw = dict(bce_ratio=cfg.bce_ratio, dice_ratio=cfg.dice_ratio,
                   focal_ratio=cfg.focal_ratio,
                   boundary_ratio=cfg.boundary_ratio, compute_unused=False)

    results = {}

    def record(name, val):
        results[name] = val
        print(f"{name}: {val:.2f}", flush=True)

    # --- full fused step first (aug included, uint8 in) ----------------
    # keep the spare copy on HOST: two device-resident states + the bs128
    # step working set would exceed the 16G HBM
    host_state = jax.device_get(state)
    step = make_train_step(cfg, aug_cfg)
    st = state
    del state

    def run_full():
        nonlocal st
        st, m = step(st, images_u8, masks_u8, key)
        return m

    record("full_step_ms", _time(run_full, lambda m: float(m.loss)) * 1e3)
    results["train_ips"] = BATCH / (results["full_step_ms"] / 1e3)

    # --- per-op profile of the full step --------------------------------
    logdir = "/tmp/bd_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        st, m = step(st, images_u8, masks_u8, key)
    float(m.loss)
    jax.profiler.stop_trace()
    results["top_ops"] = parse_trace(logdir)
    jax.tree.map(lambda a: a.delete(), st)
    del st
    state = jax.device_put(host_state)

    # --- component programs (no donation so state is reusable) ---------
    @jax.jit
    def prog_aug(images_u8, masks_u8, key):
        images = images_u8.astype(jnp.float32) / 255.0
        masks = masks_u8.astype(jnp.float32) / 255.0
        return augment_batch(key, images, masks, aug_cfg)

    im_f, mk_f = prog_aug(images_u8, masks_u8, key)
    record("aug_ms", _time(
        lambda: prog_aug(images_u8, masks_u8, key),
        lambda o: float(o[0][0, 0, 0, 0])) * 1e3)

    @jax.jit
    def prog_fwd_loss(params, batch_stats, images, masks, key):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"], rngs={"dropout": key})
        terms = weighted_loss(out, masks, **loss_kw)
        return terms.total

    record("fwd_loss_ms", _time(
        lambda: prog_fwd_loss(state.params, state.batch_stats, im_f, mk_f,
                              key),
        lambda o: float(o)) * 1e3)

    @jax.jit
    def prog_eval_fwd(params, batch_stats, images):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           images, train=False)

    record("eval_fwd_ms", _time(
        lambda: prog_eval_fwd(state.params, state.batch_stats, im_f),
        lambda o: float(o[0, 0, 0, 0])) * 1e3)

    def loss_fn(params, batch_stats, images, masks, key):
        out, updates = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"], rngs={"dropout": key})
        terms = weighted_loss(out, masks, **loss_kw)
        return terms.total, updates

    @jax.jit
    def prog_grads(params, batch_stats, images, masks, key):
        (l, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch_stats, images, masks, key)
        return l, grads

    record("fwd_bwd_ms", _time(
        lambda: prog_grads(state.params, state.batch_stats, im_f, mk_f,
                           key)[0],
        lambda o: float(o)) * 1e3)

    @jax.jit
    def prog_update(state, images, masks, key):
        (l, updates), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, images,
                                   masks, key)
        state = state.apply_gradients(grads, updates["batch_stats"])
        return state, l

    record("fwd_bwd_opt_ms", _time(
        lambda: prog_update(state, im_f, mk_f, key)[1],
        lambda o: float(o)) * 1e3)

    out_path = os.path.join(os.path.dirname(__file__), "breakdown.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


def parse_trace(logdir):
    """Top HLO ops by self time (ddti_tpu.core.xplane wire-format parser)."""
    try:
        from ddti_tpu.core.xplane import summarize
        return summarize(logdir, top=40)
    except Exception as e:
        return f"xplane parse failed: {e}"


if __name__ == "__main__":
    main()

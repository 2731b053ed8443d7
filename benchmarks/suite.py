#!/usr/bin/env python3
"""Full model-zoo throughput suite: train + inference images/sec/chip for
every architecture at 256x256 bf16, written to benchmarks/results.json.

Usage: python benchmarks/suite.py [--batch 32] [--size 256] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_model(name: str, kwargs: dict, batch: int, size: int,
                steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.models import create_model
    from ddti_tpu.train import (
        count_params,
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from ddti_tpu.train.engine import aug_config_from

    cfg = Config(batch_size=batch, image_size=size, store_size=size,
                 lr=1e-5, model_type=name)
    model = create_model(name, dtype=jnp.bfloat16, **kwargs)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, size, size, 1), cfg.lr, 100)
    n_params = count_params(state.params)
    images, masks = generate_ddti_like(batch, (size, size), 0)
    images, masks = jnp.asarray(images), jnp.asarray(masks)

    train_step = make_train_step(cfg, aug_config_from(cfg))
    eval_step = make_eval_step(cfg)
    key = jax.random.PRNGKey(1)

    for _ in range(2):
        key, k = jax.random.split(key)
        state, m = train_step(state, images, masks, k)
    float(m.loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, m = train_step(state, images, masks, k)
    float(m.loss)
    train_ips = batch * steps / (time.perf_counter() - t0)

    m = eval_step(state, images, masks)
    float(m.loss)
    t0 = time.perf_counter()
    last = [eval_step(state, images, masks) for _ in range(steps)][-1]
    float(last.loss)
    infer_ips = batch * steps / (time.perf_counter() - t0)

    return {"model": name, "params": n_params,
            "train_ips": round(train_ips, 1),
            "infer_ips": round(infer_ips, 1)}


MODELS = {
    # reference-default configurations (test.py instantiations)
    "UNet": dict(base_filters=64, depth=5),
    "ResUNet": dict(base_filters=64, depth=5),
    "ASPPUNet": dict(base_filters=64, depth=5),
    "AttentionUNet": dict(base_filters=64, depth=5),
    "TransUNet": dict(base_filters=64, depth=5, embed_dim=256, num_heads=8),
    "VNet2D": dict(base_filters=16, depth=5),
    "ImprovedVNet": dict(base_filters=16, depth=5),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--models", default=None,
                    help="comma-separated subset")
    ap.add_argument("--one", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.one:
        # child mode: one model's two programs in a fresh process
        kw = dict(MODELS[args.one])
        if args.one == "TransUNet":
            kw["image_size"] = args.size
        print("RESULT " + json.dumps(
            bench_model(args.one, kw, args.batch, args.size, args.steps)))
        return 0

    import subprocess

    names = (args.models.split(",") if args.models else list(MODELS))
    # don't import jax in the parent (children own the device); the
    # backend label follows the forced-platform env, default TPU
    backend = os.environ.get("JAX_PLATFORMS", "").split(",")[0] or "tpu"
    results = {"backend": backend, "batch": args.batch,
               "size": args.size, "models": []}
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    for name in names:
        # one model per process: after many compiles/frees a process's
        # device heap fragments and later programs measure slow (CLAUDE.md)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", name,
             "--batch", str(args.batch), "--size", str(args.size),
             "--steps", str(args.steps)],
            capture_output=True, text=True, cwd="/root/repo", env=env)
        if p.returncode != 0:
            print(f"{name} FAILED:\n{p.stderr}", file=sys.stderr)
            continue
        line = next(ln for ln in p.stdout.splitlines()
                    if ln.startswith("RESULT "))
        r = json.loads(line[len("RESULT "):])
        print(json.dumps(r), flush=True)
        results["models"].append(r)
        # write after every model: a timeout mid-sweep keeps what finished
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

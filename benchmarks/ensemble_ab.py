#!/usr/bin/env python3
"""Ensemble-bundle serving cost on the real TPU (train/export.py
export_serving_ensemble).

Measures the K-member vote's throughput vs the single-model bundle at
the flagship config — the ensemble runs K forwards per prediction, so
the expectation is ~1/K throughput; this pins the actual number (vmap
overhead, shared input conversion). Phases per process (CLAUDE.md heap
fragmentation).

Run: benchmarks/run_in_repo.sh benchmarks/ensemble_ab.py [--members 3]
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
ap.add_argument("--members", type=int, default=3)
ap.add_argument("--phase", type=int, default=None,
                help="internal: serve a k-member bundle in this process")
ap.add_argument("--dir", default=None)
ARGS = ap.parse_args()
SIZE, BATCH, REPS = ARGS.size, ARGS.batch, 20


def _model():
    import jax.numpy as jnp

    from ddti_tpu.models import ResUNet
    return ResUNet(in_channels=1, out_channels=1, base_filters=64,
                   depth=5, dtype=jnp.bfloat16)


def phase(workdir: str, k: int) -> None:
    import jax
    import jax.numpy as jnp

    from ddti_tpu.train.export import (
        aot_compile_serving,
        export_serving_ensemble,
        export_serving_program,
    )

    model = _model()
    members = []
    for seed in range(k):
        v = model.init({"params": jax.random.PRNGKey(seed)},
                       jnp.zeros((1, SIZE, SIZE, 1)), train=False)
        members.append((v["params"], v.get("batch_stats", {})))
    if k == 1:
        blob, variables = export_serving_program(
            model, members[0][0], members[0][1], batch=BATCH, size=SIZE,
            fold_bn=True, input_dtype=jnp.uint8)
    else:
        blob, variables = export_serving_ensemble(
            model, members, batch=BATCH, size=SIZE, fold_bn=True,
            input_dtype=jnp.uint8)
    serve = aot_compile_serving(blob)
    variables = jax.device_put(variables)
    x = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (BATCH, SIZE, SIZE, 1), dtype=np.uint8))
    for _ in range(2):
        p = serve(variables, x)
    int(p[0, 0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        p = serve(variables, x)
    int(p[0, 0, 0, 0])
    ips = BATCH * REPS / (time.perf_counter() - t0)
    print(f"IPS {ips:.1f}")


def main():
    if ARGS.phase is not None:
        phase(ARGS.dir, ARGS.phase)
        return
    with tempfile.TemporaryDirectory(prefix="ensab_") as wd:
        res = {}
        for k in (1, ARGS.members):
            env = dict(os.environ)
            env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
            out = subprocess.run(
                [sys.executable, __file__, "--phase", str(k), "--dir", wd,
                 "--size", str(SIZE), "--batch", str(BATCH)],
                capture_output=True, text=True, cwd="/root/repo", env=env)
            sys.stdout.write(out.stdout)
            if out.returncode != 0:
                raise RuntimeError(f"k={k} failed:\n{out.stderr[-3000:]}")
            res[k] = float([ln.split()[1] for ln in out.stdout.splitlines()
                            if ln.startswith("IPS ")][-1])
    k = ARGS.members
    print(f"\n[{SIZE}^2 bs{BATCH}] single {res[1]:.0f} img/s -> "
          f"{k}-member ensemble {res[k]:.0f} img/s "
          f"({res[1] / res[k]:.2f}x cost for {k} forwards)")


if __name__ == "__main__":
    main()

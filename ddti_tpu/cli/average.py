"""Checkpoint averaging (SWA-style): merge K trained checkpoints into one.

  python -m ddti_tpu.cli.average --checkpoints ck1 ck2 ck3 \
      --output avg.npz [--model_type ResUNet --base_filters 64 --depth 5] \
      [--weights 1,1,2] [--recalib_count 64 [--recalib_dir <images>]]

Averaging the last few checkpoints of a run (or the best checkpoints of
several seeds of the SAME architecture) is the classic cheap ensemble:
one model's cost at serve time, often a fraction of a point of IoU for
free (Izmailov et al., "Averaging Weights Leads to Wider Optima", 2018).

Accepts every checkpoint form the infer CLI does (Orbax dir, ``.npz``,
reference ``.pth`` — reference users can average their torch runs
directly), plus a MANAGED rotation root (a directory of numeric step
dirs, as written by ``--save_interval``): that expands to its kept
steps, i.e. "average the last ``max_keep_checkpoints``".

Parameters and BatchNorm means average arithmetically (optionally
weighted); averaged BN *variances* are only an approximation of the
averaged model's true activation statistics, so ``--recalib_count N``
re-estimates the running stats by streaming N images through the merged
model in train mode (the standard SWA BN-recalibration pass). Output is
a ``.npz`` weight bundle — loadable by the train CLI as a warm start
(``--checkpoint_path avg.npz``), the infer CLI, and ``cli/quantize``.

The torch reference has no ensembling/averaging tooling; its sweep
(test.sh) trains seeds and reports them individually.
"""

from __future__ import annotations

import argparse
import os


def _expand_managed(path: str) -> list:
    """A managed rotation root (directory of numeric step dirs) expands
    to its step checkpoints, oldest first; anything else passes through."""
    if os.path.isdir(path):
        steps = sorted(int(d) for d in os.listdir(path) if d.isdigit())
        if steps:
            out = []
            for s in steps:
                p = os.path.join(path, str(s))
                # CheckpointManager nests single-item saves under
                # <step>/default; bare StandardCheckpointer dirs don't
                d = os.path.join(p, "default")
                out.append(d if os.path.isdir(d) else p)
            return out
        # a single step dir of a managed root: unwrap its default item
        d = os.path.join(path, "default")
        if os.path.isdir(d):
            return [d]
    return [path]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints", required=True, nargs="+",
                    help="two or more checkpoints (Orbax dir / .npz / "
                         ".pth), or one managed rotation root to average "
                         "its kept steps")
    ap.add_argument("--output", required=True,
                    help="output .npz weight bundle")
    ap.add_argument("--weights", default=None,
                    help="comma-separated per-checkpoint weights "
                         "(default: uniform); normalized to sum 1")
    ap.add_argument("--model_type", default="ResUNet")
    ap.add_argument("--base_filters", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--model_kwargs", default=None,
                    help="JSON dict of extra create_model kwargs")
    ap.add_argument("--recalib_count", type=int, default=0,
                    help="re-estimate BN running stats on N images "
                         "through the averaged model (SWA BN pass); "
                         "0 keeps the averaged stats")
    ap.add_argument("--recalib_dir", default=None,
                    help="directory of recalibration images "
                         "(synthetic DDTI-like frames if omitted)")
    ap.add_argument("--recalib_batch", type=int, default=32)
    ap.add_argument("--recalib_passes", type=int, default=25,
                    help="passes over the recalibration images: BN "
                         "running stats are a momentum-0.9 EMA, so "
                         "~50 update steps are needed to forget the "
                         "averaged stats (0.9^50 < 1%%)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--compilation_cache", default="auto")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ddti_tpu.core import enable_compilation_cache
    enable_compilation_cache(args.compilation_cache)
    import jax.numpy as jnp
    import numpy as np

    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import (
        load_checkpoint_into,
        save_params_npz,
    )

    paths = [p for c in args.checkpoints for p in _expand_managed(c)]
    if len(paths) < 2:
        print("need at least two checkpoints to average "
              f"(got {paths})")
        return 1
    if args.weights:
        w = np.asarray([float(x) for x in args.weights.split(",")],
                       np.float64)
        if len(w) != len(paths):
            print(f"--weights has {len(w)} entries for {len(paths)} "
                  f"checkpoints ({paths})")
            return 1
    else:
        w = np.ones(len(paths), np.float64)
    w = w / w.sum()

    size = args.image_size
    kwargs = dict(in_channels=1, out_channels=1,
                  base_filters=args.base_filters, depth=args.depth)
    if args.model_type == "TransUNet":
        kwargs["image_size"] = size
    if args.model_kwargs:
        import json
        kwargs.update(json.loads(args.model_kwargs))
    model = create_model(args.model_type, **kwargs)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, size, size, 1)), train=False)
    tmpl_p, tmpl_s = variables["params"], variables.get("batch_stats", {})

    # running weighted sum in f64 on host — K checkpoints never coexist
    acc_p = jax.tree.map(lambda a: np.zeros(a.shape, np.float64), tmpl_p)
    acc_s = jax.tree.map(lambda a: np.zeros(a.shape, np.float64), tmpl_s)
    # QAT activation ranges (train --qat): conservative merge is the MAX
    # over members — a range covering every member's activations keeps
    # int8 exports of the averaged weights saturation-free
    from ddti_tpu.train.checkpoint import load_qstats
    qstats: dict = {}
    for path, wi in zip(paths, w):
        p, s = load_checkpoint_into(path, args.model_type, tmpl_p, tmpl_s)
        acc_p = jax.tree.map(
            lambda acc, x: acc + wi * np.asarray(x, np.float64), acc_p, p)
        acc_s = jax.tree.map(
            lambda acc, x: acc + wi * np.asarray(x, np.float64), acc_s, s)
        try:
            qs = load_qstats(path) or {}
        except Exception:
            qs = {}
        for k, v in qs.items():
            qstats[k] = max(qstats.get(k, 0.0), float(v))
        print(f"averaged {path} (weight {wi:.3f})")
    cast = lambda tmpl, acc: jax.tree.map(
        lambda t, a: np.asarray(a, t.dtype), tmpl, acc)
    params, stats = cast(tmpl_p, acc_p), cast(tmpl_s, acc_s)

    if args.recalib_count > 0 and jax.tree.leaves(stats):
        if args.recalib_dir:
            from PIL import Image
            names = sorted(
                n for n in os.listdir(args.recalib_dir)
                if n.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))
            )[:args.recalib_count]
            if not names:
                print(f"no images in {args.recalib_dir}")
                return 1
            imgs = np.stack([
                np.asarray(Image.open(os.path.join(args.recalib_dir, n))
                           .convert("L")
                           .resize((size, size), Image.BILINEAR),
                           np.float32)[..., None] / 255.0
                for n in names])
        else:
            from ddti_tpu.data import generate_ddti_like
            raw, _ = generate_ddti_like(args.recalib_count, (size, size), 0)
            imgs = np.asarray(raw, np.float32) / 255.0

        @jax.jit
        def bn_step(bs, x):
            _, mut = model.apply({"params": params, "batch_stats": bs},
                                 x, train=True, mutable=["batch_stats"])
            return mut["batch_stats"]

        bs = jax.tree.map(jnp.asarray, stats)
        b = max(args.recalib_batch, 1)
        for _ in range(max(args.recalib_passes, 1)):
            for i in range(0, len(imgs), b):
                chunk = imgs[i:i + b]
                if len(chunk) < b:  # keep one compiled shape
                    chunk = np.concatenate(
                        [chunk, chunk[-1:].repeat(b - len(chunk), 0)])
                bs = bn_step(bs, jnp.asarray(chunk))
        stats = jax.device_get(bs)
        print(f"recalibrated BN stats on {len(imgs)} images x "
              f"{max(args.recalib_passes, 1)} passes "
              f"({'real' if args.recalib_dir else 'synthetic'})")

    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    save_params_npz(args.output, params, stats,
                    qstats={k: np.float32(v) for k, v in qstats.items()}
                    if qstats else None)
    print(f"wrote averaged weights ({len(paths)} checkpoints"
          + (f", {len(qstats)} QAT ranges max-merged" if qstats else "")
          + f") -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Offline serving-bundle export CLI: turn any checkpoint — or a
comma-list ENSEMBLE of same-architecture checkpoints — into a deployable
StableHLO artifact, no training pipeline involved.

  python -m ddti_tpu.cli.export --checkpoint <ck>[,<ck2>,...] \
      --output <prefix> [--model_type ResUNet --base_filters 64 --depth 5] \
      [--image_size 256 --batch_size 128] [--bf16] [--tta] [--fold_bn]

Fills the gap between the train CLI (exports only its own fresh run) and
``cli/quantize`` (int8 only): f32/bf16 bundles from existing checkpoints
(Orbax dir / ``.npz`` / reference ``.pth``), and the only way to get an
ensemble vote — e.g. the K fold models of a ``ddti-split --kfold``
training — as ONE artifact (vmapped members, probability mean, baked
threshold) servable by ``cli/infer``/``cli/serve``/``load_serving_bundle``
like any other bundle. For int8 use ``cli/quantize`` (single member).

The torch reference has no deployment tooling; this extends the serving
layer built over its Trainer.test() (/root/reference/utils/trainer.py:186+).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="Orbax dir, .npz export, or reference .pth; a "
                         "comma list of same-architecture checkpoints "
                         "exports a probability-mean ensemble bundle")
    ap.add_argument("--output", required=True,
                    help="output prefix; writes <prefix>_serving_program"
                         ".stablehlo and .npz")
    ap.add_argument("--model_type", default="ResUNet")
    ap.add_argument("--base_filters", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--batch_size", default="128",
                    help="the exported program's (fixed) serving batch; a "
                         "comma list (e.g. 4,32) exports one bundle per "
                         "batch for multi-program serving (cli/serve)")
    ap.add_argument("--input_dtype", choices=["f32", "uint8"],
                    default="uint8",
                    help="exported input: raw uint8 bytes (deployment "
                         "default) or f32 [0,1]")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute graph (matches bf16-trained runs)")
    ap.add_argument("--weights_dtype", choices=["keep", "bf16"],
                    default="keep",
                    help="bf16 halves the .npz bundle (serving throughput "
                         "is unchanged — PERF_NOTES.md)")
    ap.add_argument("--fold_bn", action="store_true",
                    help="fold BatchNorm into conv kernels (recommended: "
                         "removes all normalization arithmetic)")
    ap.add_argument("--tta", action="store_true",
                    help="bake the 4-way flip TTA ensemble per member")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="binarization threshold baked into the program")
    ap.add_argument("--model_kwargs", default=None,
                    help="JSON dict of extra create_model kwargs")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--compilation_cache", default="auto",
                    help="persistent XLA compile cache dir; 'off' disables")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ddti_tpu.core import enable_compilation_cache
    enable_compilation_cache(args.compilation_cache)
    import jax.numpy as jnp

    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import (
        load_checkpoint_into,
        save_variables_npz,
    )
    from ddti_tpu.train.export import (
        export_serving_ensemble,
        export_serving_program,
    )

    size = args.image_size
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    kwargs = dict(in_channels=1, out_channels=1,
                  base_filters=args.base_filters, depth=args.depth,
                  dtype=dtype)
    if args.model_type == "TransUNet":
        kwargs["image_size"] = size
    if args.model_kwargs:
        import json
        kwargs.update(json.loads(args.model_kwargs))
    model = create_model(args.model_type, **kwargs)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, size, size, 1)), train=False)

    paths = [p for p in args.checkpoint.split(",") if p]
    members = []
    for ck in paths:
        p, s = load_checkpoint_into(ck, args.model_type,
                                    variables["params"],
                                    variables.get("batch_stats", {}))
        members.append((p, s))

    in_dtype = jnp.uint8 if args.input_dtype == "uint8" else jnp.float32
    wdtype = jnp.bfloat16 if args.weights_dtype == "bf16" else None
    batches = [int(b) for b in str(args.batch_size).split(",") if b]
    for batch in batches:
        suffix = f"_b{batch}" if len(batches) > 1 else ""
        if len(members) > 1:
            blob, svars = export_serving_ensemble(
                model, members, batch=batch, size=size,
                threshold=args.threshold, fold_bn=args.fold_bn,
                input_dtype=in_dtype, weights_dtype=wdtype, tta=args.tta)
            note = f"{len(members)}-member ensemble"
        else:
            blob, svars = export_serving_program(
                model, members[0][0], members[0][1], batch=batch,
                size=size, threshold=args.threshold, fold_bn=args.fold_bn,
                input_dtype=in_dtype, weights_dtype=wdtype, tta=args.tta)
            note = "single model"
        prog = args.output + suffix + "_serving_program.stablehlo"
        with open(prog, "wb") as f:
            f.write(blob)
        save_variables_npz(os.path.splitext(prog)[0] + ".npz", svars)
        print(f"wrote {prog} (+ .npz, {note}, batch={batch} size={size} "
              f"input={args.input_dtype}"
              + (", tta" if args.tta else "")
              + (", fold_bn" if args.fold_bn else "") + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())

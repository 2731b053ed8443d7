"""Offline quantization CLI: turn any trained checkpoint into an int8
serving bundle — no retraining, no training pipeline.

  python -m ddti_tpu.cli.quantize --checkpoint <ck> --output <prefix> \
      [--model_type ResUNet --base_filters 64 --depth 5] \
      [--calib_dir <images>] [--image_size 256 --batch_size 128]

Accepts every checkpoint form the infer CLI does (Orbax dir, ``.npz``,
reference-format ``.pth`` — so torch users can quantize their weights
directly), calibrates activation scales on real images from
``--calib_dir`` (or synthetic DDTI-like frames), and writes
``<prefix>_serving_program.stablehlo`` + ``.npz`` — loadable by
``cli/infer.py --checkpoint <...>.stablehlo`` and
``train.export.load_serving_bundle``. See train/quantize.py for the
quantization scheme (per-channel int8 weights, s8 MXU convs, exact s32
accumulation).

The torch reference has no deployment or quantization tooling; this is
part of the serving layer built over its Trainer.test()
(/root/reference/utils/trainer.py:186+).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="Orbax dir, .npz export, or reference .pth")
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
                         "batch — serve them together via cli/serve "
                         "--checkpoint b4,b32 (multi-program serving)")
    ap.add_argument("--calib_dir", default=None,
                    help="directory of calibration images (up to "
                         "--calib_count used); synthetic frames if omitted")
    ap.add_argument("--calib_count", type=int, default=32)
    ap.add_argument("--min_channels", default="0",
                    help="mixed precision: quantize only convs with "
                         "max(cin,cout) >= this (shallow high-res levels "
                         "are HBM-bound and faster in bf16 — use 128 for "
                         "512^2 serving; benchmarks/PERF_NOTES.md). "
                         "'auto' exports the 0 and 128 variants, times "
                         "both on the device, and keeps the faster")
    ap.add_argument("--input_dtype", choices=["f32", "uint8"],
                    default="f32",
                    help="exported program input: f32 [0,1] (infer-CLI "
                         "compatible) or raw uint8 bytes")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute graph (matches bf16-trained runs)")
    ap.add_argument("--model_kwargs", default=None,
                    help="JSON dict of extra create_model kwargs (e.g. "
                         "'{\"embed_dim\": 128, \"num_heads\": 4}' for a "
                         "non-default TransUNet)")
    ap.add_argument("--tta", action="store_true",
                    help="bake the 4-way flip TTA ensemble into the "
                         "exported serving program (eval/tta.py)")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="binarization threshold baked into the program "
                         "(e.g. the train CLI's --tune_threshold result, "
                         "logged as 'Threshold sweep ... -> using T')")
    ap.add_argument("--no_qstats", action="store_true",
                    help="ignore QAT-learned activation ranges carried by "
                         "the checkpoint (train --qat) and calibrate on "
                         "images instead")
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
    import numpy as np

    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import (
        load_checkpoint_into,
        save_variables_npz,
    )
    from ddti_tpu.train.quantize import export_serving_int8

    size = args.image_size
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    kwargs = dict(in_channels=1, out_channels=1,
                  base_filters=args.base_filters, depth=args.depth,
                  dtype=dtype)
    if args.model_type == "TransUNet":
        # pos_emb token count derives from the input resolution
        kwargs["image_size"] = size
    if args.model_kwargs:
        import json
        kwargs.update(json.loads(args.model_kwargs))
    model = create_model(args.model_type, **kwargs)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, size, size, 1)), train=False)
    params, stats = load_checkpoint_into(
        args.checkpoint, args.model_type, variables["params"],
        variables.get("batch_stats", {}))

    # a --qat training run saved its activation-range EMA alongside the
    # weights; those ranges (learned over the whole run) beat one-batch
    # calibration — use them unless told otherwise
    qat_amax = None
    if not args.no_qstats:
        from ddti_tpu.train.checkpoint import load_qstats
        qs = load_qstats(args.checkpoint)
        if qs:
            # an all-zero range tree (a --qat run that never completed a
            # step) must fall back to calibration, not pass an empty dict
            qat_amax = {tuple(p.split("/")): v for p, v in qs.items()
                        if v > 0} or None
            if qat_amax:
                print(f"using {len(qat_amax)} QAT-learned activation "
                      "ranges from the checkpoint (disable with "
                      "--no_qstats)")

    if args.calib_dir:
        from PIL import Image
        names = sorted(n for n in os.listdir(args.calib_dir)
                       if n.lower().endswith((".jpg", ".jpeg", ".png",
                                              ".bmp")))[:args.calib_count]
        if not names:
            print(f"no images in {args.calib_dir}")
            return 1
        calib = np.stack([
            np.asarray(Image.open(os.path.join(args.calib_dir, n))
                       .convert("L").resize((size, size), Image.BILINEAR),
                       np.float32)[..., None] / 255.0
            for n in names])
    else:
        from ddti_tpu.data import generate_ddti_like
        imgs, _ = generate_ddti_like(args.calib_count, (size, size), 0)
        calib = np.asarray(imgs, np.float32) / 255.0
    if not qat_amax:
        print(f"calibrating on {len(calib)} images "
              f"({'real' if args.calib_dir else 'synthetic'})")

    in_dtype = jnp.uint8 if args.input_dtype == "uint8" else jnp.float32
    prog = args.output + "_serving_program.stablehlo"
    os.makedirs(os.path.dirname(os.path.abspath(prog)), exist_ok=True)
    batches = sorted({int(b) for b in str(args.batch_size).split(",")})
    args.batch_size = batches[-1]  # auto-selection times the largest

    if args.min_channels == "auto":
        # export both documented crossover candidates (PERF_NOTES.md:
        # full int8 wins at 256², mc=128 at 512²), time them AOT-compiled
        # on the device, keep the faster
        import time

        from ddti_tpu.train.export import load_serving_bundle

        best = None
        for mc in (0, 128):
            blob, svars = export_serving_int8(
                model, params, stats, batch=args.batch_size, size=size,
                calib_images=None if qat_amax else jnp.asarray(calib),
                amax=qat_amax, input_dtype=in_dtype,
                threshold=args.threshold, min_channels=mc, tta=args.tta)
            cand = args.output + f"_mc{mc}_serving_program.stablehlo"
            with open(cand, "wb") as f:
                f.write(blob)
            save_variables_npz(cand.replace(".stablehlo", ".npz"), svars)
            fn, batch_n, sz, dt = load_serving_bundle(cand)
            x = np.zeros((batch_n, sz, sz, 1),
                         np.uint8 if np.dtype(dt) == np.uint8
                         else np.float32)
            np.asarray(fn(x))  # compile + warm
            t0 = time.perf_counter()
            for _ in range(6):
                r = fn(x)
            np.asarray(r)  # device sync (block_until_ready is unreliable
            #                on the axon tunnel backend)
            ms = (time.perf_counter() - t0) / 6 * 1e3
            print(f"min_channels={mc}: {ms:.1f} ms/batch "
                  f"({args.batch_size / ms * 1e3:.1f} img/s)")
            if best is None or ms < best[1]:
                best = (mc, ms, blob, svars)
        mc, ms, blob, svars = best
        print(f"auto: keeping min_channels={mc}")
        for loser in (0, 128):
            for ext in (".stablehlo", ".npz"):
                os.remove(args.output + f"_mc{loser}_serving_program{ext}")
        exported = {batches[-1]: (blob, svars)}
    else:
        mc = int(args.min_channels)
        exported = {}

    written = []
    svars_shared = None
    for bn in batches:
        if bn in exported:
            blob, svars = exported[bn]
        else:
            if svars_shared is None:
                # quantize + calibrate ONCE; every batch shape exports
                # from the same variables (each program compile already
                # costs 30-60 s — no reason to redo the device work)
                from ddti_tpu.train.quantize import quantize_serving
                svars_shared = quantize_serving(
                    model, params, stats,
                    None if qat_amax else jnp.asarray(calib),
                    amax=qat_amax, min_channels=mc)
            from ddti_tpu.train.quantize import export_quantized_program
            svars = svars_shared
            blob = export_quantized_program(
                model, svars_shared, batch=bn, size=size,
                threshold=args.threshold, input_dtype=in_dtype,
                tta=args.tta)
        out = (prog if len(batches) == 1
               else args.output + f"_b{bn}_serving_program.stablehlo")
        with open(out, "wb") as f:
            f.write(blob)
        save_variables_npz(out.replace(".stablehlo", ".npz"), svars)
        n_q = sum(1 for a in
                  jax.tree_util.tree_leaves(svars.get("quant", {}))
                  if a.dtype == jnp.int8)
        print(f"wrote {out} (+ .npz, {n_q} int8 conv kernels, "
              f"batch={bn} size={size} input={args.input_dtype})")
        written.append(out)
    if len(written) > 1:
        print("serve the set: python -m ddti_tpu.cli.serve --checkpoint "
              + ",".join(written))
    return 0


if __name__ == "__main__":
    sys.exit(main())

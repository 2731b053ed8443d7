"""Batch inference CLI — the serving-style entry point the reference lacks.

Loads a checkpoint (Orbax dir, .npz export, reference-format .pth, or a
``.stablehlo`` serving bundle from ``--export_serving``) and predicts nodule
masks for every image in a directory, either resized to the training
resolution (reference behavior) or at native resolution via sliding-window
tiling. Writes ``<name>_pred.png`` masks and optional contour overlays.
With a ``.stablehlo`` artifact no model code runs at all — the AOT-compiled
program (plus its sibling ``.npz`` weight bundle for weights-as-arguments
exports) is the entire model.

Usage:
  python -m ddti_tpu.cli.infer --checkpoint ck --input_dir imgs \
      --output_dir preds [--model_type ResUNet] [--sliding_window]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def _maybe_overlay(args, name: str, mask) -> None:
    """--overlay output: the original grayscale image with the predicted
    contours drawn in red (marching-squares, eval/contours.py), written as
    ``<name>_overlay.png``. ``mask`` is the final mask at the ORIGINAL
    image resolution — binary (bool/0-255) or, under --prob, a soft
    0-255 probability map; the contour is drawn at the operating
    threshold (--threshold, a no-op for binary masks)."""
    if not getattr(args, "overlay", False):
        return
    import numpy as np
    from PIL import Image

    from ddti_tpu.eval.contours import find_contours

    gray = np.asarray(
        Image.open(os.path.join(args.input_dir, name)).convert("L"))
    rgb = np.repeat(gray[..., None], 3, axis=-1).copy()
    # masks arrive 0-255: binarized upstream at --threshold (contour any
    # level strictly inside (0, 255)), or a soft prob*255 map under
    # --prob (contour AT the operating threshold). No scale sniffing —
    # the --prob flag says which.
    thr255 = (float(getattr(args, "threshold", 0.5)) * 255
              if getattr(args, "prob", False) else 127.5)
    m = (np.asarray(mask, np.float32) > thr255).astype(np.float32)
    for c in find_contours(m, 0.5):
        rr = np.clip(np.round(c[:, 0]).astype(int), 0, rgb.shape[0] - 1)
        cc = np.clip(np.round(c[:, 1]).astype(int), 0, rgb.shape[1] - 1)
        rgb[rr, cc] = (255, 0, 0)
    Image.fromarray(rgb).save(os.path.join(
        args.output_dir, os.path.splitext(name)[0] + "_overlay.png"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="checkpoint (Orbax dir / .npz / reference .pth / "
                         ".stablehlo bundle). A COMMA LIST of live "
                         "checkpoints of the same architecture predicts "
                         "as a probability-mean ensemble — e.g. the k "
                         "fold models from a ddti-split k-fold training")
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--model_type", default="ResUNet")
    ap.add_argument("--base_filters", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--sliding_window", action="store_true",
                    help="native-resolution tiled inference")
    ap.add_argument("--window", type=int, default=512)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--overlay", action="store_true",
                    help="also write contour overlays")
    ap.add_argument("--prob", action="store_true",
                    help="write soft probability maps (grayscale 0-255) "
                         "instead of binary masks — per-pixel confidence "
                         "for clinical review / downstream thresholding "
                         "(live checkpoints only; .stablehlo bundles bake "
                         "the binarization in)")
    ap.add_argument("--tta", action="store_true",
                    help="4-way flip test-time augmentation (live "
                         "checkpoints; for .stablehlo bundles TTA is baked "
                         "at export time via --tta on the exporter)")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="binarization threshold for live checkpoints — "
                         "e.g. the train CLI's --tune_threshold operating "
                         "point (.stablehlo bundles bake theirs at export)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fold_bn", action="store_true",
                    help="fold BatchNorm into conv kernels before serving")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--weights", default=None,
                    help="weight bundle (.npz) for a weights-as-arguments "
                         ".stablehlo serving program; defaults to the "
                         "program path with .stablehlo -> .npz")
    ap.add_argument("--compilation_cache", default="auto",
                    help="persistent XLA compile cache dir; 'off' disables")
    ap.add_argument("--mask_dir", default=None,
                    help="ground-truth <stem>_mask.* directory: after "
                         "predicting, score the predictions (IoU/F1 + "
                         "HD95/ASSD) and write eval_metrics.json + "
                         "per_image_metrics.csv into --output_dir — "
                         "evaluates ANY artifact (incl. reference .pth "
                         "and int8 bundles) on any labeled folder")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ddti_tpu.core import enable_compilation_cache
    enable_compilation_cache(args.compilation_cache)
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    ck_paths = [p for p in args.checkpoint.split(",") if p]
    if any(p.endswith(".stablehlo") for p in ck_paths):
        if len(ck_paths) > 1:
            print("error: checkpoint ensembles need live checkpoints "
                  "(.stablehlo bundles bake binarization in — their masks "
                  "can't be probability-averaged). Export one bundle per "
                  "member and vote downstream, or pass Orbax/.npz/.pth "
                  "checkpoints here.")
            return 1
        if args.prob:
            print("warning: --prob is unavailable for .stablehlo bundles "
                  "(binarization is baked into the exported program); "
                  "writing binary masks")
            args.prob = False  # downstream (overlay) sees binary masks
        rc = _infer_serving_bundle(args)
        if rc == 0:
            _maybe_eval(args)
        return rc

    from ddti_tpu.models import create_model

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    kwargs = dict(in_channels=1, out_channels=1,
                  base_filters=args.base_filters, depth=args.depth,
                  dtype=dtype)
    if args.model_type == "TransUNet":
        kwargs["image_size"] = (args.window if args.sliding_window
                                else args.image_size)
    model = create_model(args.model_type, **kwargs)
    init_size = args.window if args.sliding_window else args.image_size
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, init_size, init_size, 1)),
                           train=False)
    params, stats = variables["params"], variables.get("batch_stats", {})

    from ddti_tpu.train.checkpoint import load_checkpoint_into
    members = []
    for ck in ck_paths:
        p, s = load_checkpoint_into(ck, args.model_type, params, stats)
        if args.fold_bn:
            from ddti_tpu.train.fold_bn import fold_batchnorm
            p, s = fold_batchnorm(model, p, s)
        members.append({"params": p, "batch_stats": s})
    if len(members) == 1:
        variables = members[0]
    else:
        # probability-mean ensemble (the standard segmentation vote, e.g.
        # across k-fold models): stack the member trees on a leading axis
        # and vmap ONE forward over it — a single jitted program runs all
        # members. Expressed back as logit(mean prob) so every downstream
        # consumer (threshold, --prob, TTA wrapper, sliding-window Hann
        # blend) works unchanged.
        variables = jax.tree.map(lambda *xs: jnp.stack(xs), *members)
        print(f"ensembling {len(members)} checkpoints (probability mean)")

    os.makedirs(args.output_dir, exist_ok=True)
    names = sorted(n for n in os.listdir(args.input_dir)
                   if n.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not names:
        print(f"no images in {args.input_dir}")
        return 1

    def _one_logits(v, x):
        out = model.apply(v, x, train=False)
        return out[0] if isinstance(out, tuple) else out

    if len(members) == 1:
        _logits = _one_logits
    else:
        def _logits(v, x):
            lg = jax.vmap(lambda m: _one_logits(m, x))(v)  # (K, B, H, W, 1)
            p = jax.nn.sigmoid(lg.astype(jnp.float32)).mean(axis=0)
            p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
            return jnp.log(p) - jnp.log1p(-p)  # logit of the mean prob

    if args.tta:
        # the flip ensemble expressed as a logit map: downstream sigmoid/
        # threshold and the sliding-window blender consume it unchanged
        from ddti_tpu.eval.tta import tta_logits
        apply_fn = jax.jit(
            lambda v, x: tta_logits(lambda im: _logits(v, im), x))
    else:
        apply_fn = jax.jit(_logits)
    t0 = time.perf_counter()
    n_done = 0

    if args.sliding_window:
        from ddti_tpu.eval.sliding_window import sliding_window_logits
        for name in names:
            img = Image.open(os.path.join(args.input_dir, name)).convert("L")
            arr = jnp.asarray(np.asarray(img, np.float32)[..., None] / 255.0)
            # pass the HOISTED apply_fn: it is a static jit arg of the
            # sliding-window program, so a fresh lambda per image would
            # recompile every frame (~minutes each on the TPU tunnel)
            logits = sliding_window_logits(
                apply_fn, variables, arr,
                window=args.window, stride=args.stride)
            probs = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))
            out = (probs if args.prob
                   else (probs > args.threshold))[..., 0] * 255
            Image.fromarray(out.astype(np.uint8)).save(
                os.path.join(args.output_dir,
                             os.path.splitext(name)[0] + "_pred.png"))
            _maybe_overlay(args, name, out)
            n_done += 1
    else:
        size = args.image_size
        batch, metas = [], []

        def flush():
            nonlocal n_done
            if not batch:
                return
            x = np.stack(batch)
            if len(batch) < args.batch_size:
                # zero-pad the tail to the compiled batch shape: an
                # odd-shaped final batch would trace+compile a SECOND
                # program (30-60 s through the TPU tunnel)
                pad = np.zeros((args.batch_size - len(batch),)
                               + x.shape[1:], x.dtype)
                x = np.concatenate([x, pad])
            logits = apply_fn(variables, jnp.asarray(x))
            probs = np.asarray(jax.nn.sigmoid(
                logits.astype(jnp.float32)))[:len(batch)]
            preds = probs if args.prob else (probs > args.threshold)
            for p, (name, orig_size) in zip(preds, metas):
                m = Image.fromarray((p[..., 0] * 255).astype(np.uint8))
                m = m.resize(orig_size,
                             Image.BILINEAR if args.prob else Image.NEAREST)
                m.save(os.path.join(
                    args.output_dir,
                    os.path.splitext(name)[0] + "_pred.png"))
                _maybe_overlay(args, name, m)
                n_done += 1
            batch.clear()
            metas.clear()

        for name in names:
            img = Image.open(os.path.join(args.input_dir, name)).convert("L")
            metas.append((name, img.size))
            img = img.resize((size, size), Image.BILINEAR)
            batch.append(np.asarray(img, np.float32)[..., None] / 255.0)
            if len(batch) == args.batch_size:
                flush()
        flush()

    dt = time.perf_counter() - t0
    print(f"predicted {n_done} images in {dt:.1f}s "
          f"({n_done / max(dt, 1e-9):.1f} img/s)")
    _maybe_eval(args)
    return 0


def _maybe_eval(args) -> None:
    """--mask_dir: score the just-written predictions against ground
    truth (eval/folder_eval.py) — the standalone-evaluation path for any
    servable artifact. Soft --prob maps binarize at the SAME --threshold
    they were written with; binary masks (0/255) at the 127 midpoint."""
    if not getattr(args, "mask_dir", None):
        return
    from ddti_tpu.eval.folder_eval import (
        evaluate_predictions,
        write_eval_artifacts,
    )
    thr255 = (float(args.threshold) * 255.0
              if getattr(args, "prob", False) else 127.0)
    summary, rows = evaluate_predictions(args.output_dir, args.mask_dir,
                                         pred_thresh255=thr255)
    if not rows:
        print(f"--mask_dir: no <stem>_pred.png / <stem>_mask.* pairs "
              f"matched between {args.output_dir} and {args.mask_dir}")
        return
    print(write_eval_artifacts(args.output_dir, summary, rows))


def _infer_serving_bundle(args) -> int:
    """Serve straight from the deployment artifact ``--export_serving``
    writes (StableHLO program + .npz weight bundle): no model code, no
    checkpoint surgery, fixed exported batch/size (partial batches are
    zero-padded). The deployment analogue of the reference's test loop
    (/root/reference/utils/trainer.py:190-260), which always rebuilds the
    torch model to predict."""
    import numpy as np
    from PIL import Image

    from ddti_tpu.train.export import load_serving_bundle

    serve, batch_n, size, in_dtype = load_serving_bundle(
        args.checkpoint, args.weights)
    names = sorted(n for n in os.listdir(args.input_dir)
                   if n.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not names:
        print(f"no images in {args.input_dir}")
        return 1
    os.makedirs(args.output_dir, exist_ok=True)

    if args.sliding_window:
        # native-resolution tiled serving from the fixed-shape artifact:
        # the exported (batch, size, size) program runs over overlapping
        # size x size tiles; since the artifact emits BINARIZED masks, the
        # Hann-weighted blend is a weighted majority vote per pixel
        # (soft-logit blending needs the live model — use the non-bundle
        # path for that).
        return _serve_bundle_tiled(args, serve, batch_n, size, in_dtype,
                                   names)

    t0 = time.perf_counter()
    n_done = 0
    for start in range(0, len(names), batch_n):
        chunk = names[start:start + batch_n]
        arrs, metas = [], []
        for name in chunk:
            img = Image.open(os.path.join(args.input_dir, name)).convert("L")
            metas.append((name, img.size))
            img = img.resize((size, size), Image.BILINEAR)
            a = np.asarray(img, np.uint8)[..., None]
            if in_dtype != np.uint8:
                a = a.astype(in_dtype) / np.asarray(255, in_dtype)
            arrs.append(a)
        x = np.stack(arrs)
        if len(chunk) < batch_n:  # pad the tail to the exported batch
            pad = np.zeros((batch_n - len(chunk),) + x.shape[1:], x.dtype)
            x = np.concatenate([x, pad])
        preds = np.asarray(serve(x))[:len(chunk)]
        for p, (name, orig_size) in zip(preds, metas):
            m = Image.fromarray((p[..., 0] * 255).astype(np.uint8))
            m = m.resize(orig_size, Image.NEAREST)
            m.save(os.path.join(args.output_dir,
                                os.path.splitext(name)[0] + "_pred.png"))
            _maybe_overlay(args, name, m)
            n_done += 1
    dt = time.perf_counter() - t0
    print(f"served {n_done} images in {dt:.1f}s "
          f"({n_done / max(dt, 1e-9):.1f} img/s) "
          f"[artifact batch={batch_n} size={size}]")
    return 0


def _serve_bundle_tiled(args, serve, batch_n, window, in_dtype,
                        names) -> int:
    """Sliding-window serving from a fixed-shape .stablehlo bundle: host
    tiles each frame into the artifact's (window, window) input, batches
    tiles to the exported batch size, and blends the binarized tile masks
    with a Hann-weighted vote. No model code involved."""
    import numpy as np
    from PIL import Image

    from ddti_tpu.eval.sliding_window import _importance, _tile_positions

    stride = min(args.stride, window)
    weight = _importance(window)  # (window, window) Hann vote weights
    t0 = time.perf_counter()
    n_done = 0
    for name in names:
        img = Image.open(os.path.join(args.input_dir, name)).convert("L")
        frame = np.asarray(img, np.uint8)
        h, w = frame.shape
        pad_h = max(window - h, (-h) % stride if h > window else 0)
        pad_w = max(window - w, (-w) % stride if w > window else 0)
        from ddti_tpu.eval.sliding_window import reflect_pad_2d
        padded = reflect_pad_2d(frame, pad_h, pad_w)
        ph, pw = padded.shape
        coords = [(y, x) for y in _tile_positions(ph, window, stride)
                  for x in _tile_positions(pw, window, stride)]

        tiles = np.stack([padded[y:y + window, x:x + window]
                          for y, x in coords])[..., None]
        if in_dtype != np.uint8:
            tiles = tiles.astype(in_dtype) / np.asarray(255, in_dtype)
        n_tiles = len(coords)
        pad_t = (-n_tiles) % batch_n
        if pad_t:
            tiles = np.concatenate(
                [tiles, np.zeros((pad_t,) + tiles.shape[1:], tiles.dtype)])
        preds = np.concatenate(
            [np.asarray(serve(tiles[i:i + batch_n]))
             for i in range(0, len(tiles), batch_n)])[:n_tiles]

        acc = np.zeros((ph, pw), np.float32)
        norm = np.zeros((ph, pw), np.float32)
        for (y, x), p in zip(coords, preds):
            acc[y:y + window, x:x + window] += p[..., 0] * weight
            norm[y:y + window, x:x + window] += weight
        mask = ((acc / norm)[:h, :w] > 0.5).astype(np.uint8) * 255
        Image.fromarray(mask).save(os.path.join(
            args.output_dir, os.path.splitext(name)[0] + "_pred.png"))
        _maybe_overlay(args, name, mask)
        n_done += 1
    dt = time.perf_counter() - t0
    print(f"served {n_done} frames tiled in {dt:.1f}s "
          f"({n_done / max(dt, 1e-9):.1f} img/s) "
          f"[artifact batch={batch_n} window={window} stride={stride}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())

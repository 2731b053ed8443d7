"""Score a folder of predicted masks against ground-truth masks.

Powers ``cli/infer --mask_dir``: after the infer CLI writes
``<stem>_pred.png`` masks, this evaluates them against
``<mask_dir>/<stem>_mask.*`` — so ANY artifact the infer CLI can run
(live Orbax/.npz checkpoints, the torch reference's own ``.pth`` files,
f32/int8 ``.stablehlo`` serving bundles, sliding-window mode) is scorable
on ANY labeled folder, without a Trainer or run directory. The torch
reference can only score inside its own training harness
(/root/reference/utils/trainer.py:206-299).

Conventions: predictions binarize at >127 of the 0-255 PNG (the infer
CLI's binary masks are 0/255; ``--prob`` maps score at the operating
threshold upstream), ground truth at >127 (i.e. 0.5 — NOT the training
harness's reference-quirk ``> 0``, which would count JPEG compression
noise as foreground on raw mask files). Global metrics micro-average
over all pixels (the reference test() formula); HD95/ASSD use the same
medpy conventions as ``eval/surface.py`` (scipy oracle — images here can
have per-file shapes, so the batched device path doesn't apply).
"""

from __future__ import annotations

import math
import os


def evaluate_predictions(pred_dir: str, mask_dir: str,
                         surface: bool = True,
                         pred_thresh255: float = 127.0) -> tuple[dict, list]:
    """Returns (summary, per_image_rows). Pairs ``<stem>_pred.png`` in
    ``pred_dir`` with ``<stem>_mask.*`` in ``mask_dir``; unmatched or
    shape-mismatched files are reported in ``summary['skipped']``.
    ``pred_thresh255`` is the prediction binarization point on the 0-255
    PNG scale (soft ``--prob`` maps score at their operating threshold)."""
    import numpy as np
    from PIL import Image

    from ddti_tpu.eval.metrics import metrics_from_counts

    masks = {}
    for f in sorted(os.listdir(mask_dir)):
        stem, ext = os.path.splitext(f)
        if ext.lower() in (".jpg", ".jpeg", ".png", ".bmp") and \
                stem.endswith("_mask"):
            masks[stem[:-len("_mask")]] = f

    rows, skipped = [], []
    tot = dict(tp=0, fp=0, fn=0, tn=0)
    for f in sorted(os.listdir(pred_dir)):
        if not f.endswith("_pred.png"):
            continue
        stem = f[:-len("_pred.png")]
        if stem not in masks:
            skipped.append((f, "no mask"))
            continue
        pred = np.asarray(Image.open(os.path.join(pred_dir, f))
                          .convert("L")) > pred_thresh255
        gt = np.asarray(Image.open(os.path.join(mask_dir, masks[stem]))
                        .convert("L")) > 127
        if pred.shape != gt.shape:
            skipped.append((f, f"shape {pred.shape} vs {gt.shape}"))
            continue
        tp = int(np.sum(pred & gt))
        fp = int(np.sum(pred & ~gt))
        fn = int(np.sum(~pred & gt))
        tn = int(np.sum(~pred & ~gt))
        union = tp + fp + fn
        row = {
            "name": stem,
            "iou": tp / union if union else float("nan"),
            "dice": 2 * tp / (2 * tp + fp + fn) if union else float("nan"),
            "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        }
        if surface:
            from ddti_tpu.eval.surface import surface_distance_stats_oracle
            sd = surface_distance_stats_oracle(pred, gt)
            row["hd95"], row["assd"] = sd["hd95"], sd["assd"]
        for k in tot:
            tot[k] += row[k]
        rows.append(row)

    summary = {"images": len(rows), "skipped": skipped}
    if rows:
        summary.update(metrics_from_counts(**tot))
        ious = [r["iou"] for r in rows if not math.isnan(r["iou"])]
        if ious:
            summary["iou_per_image_mean"] = float(np.mean(ious))
            summary["iou_per_image_median"] = float(np.median(ious))
        if surface:
            sds = [(r["hd95"], r["assd"]) for r in rows
                   if not math.isnan(r["hd95"])]
            if sds:
                summary["hd95_mean"] = float(np.mean([s[0] for s in sds]))
                summary["assd_mean"] = float(np.mean([s[1] for s in sds]))
                summary["surface_valid_images"] = len(sds)
    rows.sort(key=lambda r: (math.isnan(r["iou"]), r["iou"]))
    return summary, rows


def write_eval_artifacts(out_dir: str, summary: dict, rows: list) -> str:
    """``eval_metrics.json`` + ``per_image_metrics.csv`` into ``out_dir``;
    returns a one-line human summary."""
    import csv
    import json

    with open(os.path.join(out_dir, "eval_metrics.json"), "w") as f:
        json.dump({k: v for k, v in summary.items() if k != "skipped"},
                  f, indent=1)
    if rows:
        with open(os.path.join(out_dir, "per_image_metrics.csv"), "w",
                  newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
    line = (f"eval vs {summary['images']} masks: "
            f"IoU={summary.get('iou', float('nan')):.4f} "
            f"F1={summary.get('f1', float('nan')):.4f}")
    if "hd95_mean" in summary:
        line += (f" HD95={summary['hd95_mean']:.2f} "
                 f"ASSD={summary['assd_mean']:.2f}")
    if summary["skipped"]:
        line += f" ({len(summary['skipped'])} skipped)"
    return line

"""Standalone prediction-folder evaluation (eval/folder_eval.py,
cli/infer --mask_dir)."""

import json
import os

import numpy as np
from PIL import Image

from ddti_tpu.eval.folder_eval import evaluate_predictions


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r


def _save(path, mask):
    Image.fromarray(mask.astype(np.uint8) * 255, "L").save(path)


def test_evaluate_predictions_counts_and_surface(tmp_path):
    pred_dir = tmp_path / "preds"
    mask_dir = tmp_path / "masks"
    os.makedirs(pred_dir)
    os.makedirs(mask_dir)
    gts, preds = [], []
    for i, (dy, r) in enumerate([(0, 10), (3, 8), (6, 12)]):
        gt = _disk(48, 48, 24, 24, 10)
        pr = _disk(48, 48, 24 + dy, 24, r)
        _save(mask_dir / f"im{i}_mask.png", gt)
        _save(pred_dir / f"im{i}_pred.png", pr)
        gts.append(gt)
        preds.append(pr)
    # an unmatched prediction and a shape mismatch get skipped, not fatal
    _save(pred_dir / "orphan_pred.png", _disk(48, 48, 10, 10, 5))
    _save(pred_dir / "odd_pred.png", _disk(32, 32, 10, 10, 5))
    _save(mask_dir / "odd_mask.png", _disk(48, 48, 10, 10, 5))

    summary, rows = evaluate_predictions(str(pred_dir), str(mask_dir))
    assert summary["images"] == 3
    assert len(summary["skipped"]) == 2

    tp = sum(int(np.sum(p & g)) for p, g in zip(preds, gts))
    fp = sum(int(np.sum(p & ~g)) for p, g in zip(preds, gts))
    fn = sum(int(np.sum(~p & g)) for p, g in zip(preds, gts))
    assert summary["iou"] == tp / (tp + fp + fn + 1e-8)
    # exact-match image scores IoU 1 and zero surface distance
    perfect = [r for r in rows if r["name"] == "im0"][0]
    assert perfect["iou"] == 1.0 and perfect["hd95"] == 0.0
    # rows sorted worst-first
    ious = [r["iou"] for r in rows]
    assert ious == sorted(ious)
    assert "hd95_mean" in summary and summary["surface_valid_images"] == 3


def test_infer_cli_mask_dir_end_to_end(tmp_path):
    """Full CLI path: predict from an .npz checkpoint, score vs masks."""
    import jax
    import jax.numpy as jnp

    from ddti_tpu.cli.infer import main
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz

    model = create_model("UNet", base_filters=8, depth=2)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    ck = str(tmp_path / "w.npz")
    save_params_npz(ck, v["params"], v.get("batch_stats", {}))

    img_dir = tmp_path / "imgs"
    mask_dir = tmp_path / "masks"
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (32, 32), dtype=np.uint8),
                        "L").save(img_dir / f"s{i}.png")
        _save(mask_dir / f"s{i}_mask.png", _disk(32, 32, 16, 16, 8))
    out = tmp_path / "preds"
    assert main(["--checkpoint", ck, "--input_dir", str(img_dir),
                 "--output_dir", str(out), "--model_type", "UNet",
                 "--base_filters", "8", "--depth", "2",
                 "--image_size", "32", "--cpu",
                 "--mask_dir", str(mask_dir)]) == 0
    with open(out / "eval_metrics.json") as f:
        em = json.load(f)
    assert em["images"] == 3 and 0.0 <= em["iou"] <= 1.0
    assert os.path.isfile(out / "per_image_metrics.csv")

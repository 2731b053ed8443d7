"""Surface-distance metrics (eval/surface.py) vs the scipy oracle.

The oracle re-derives medpy.metric.binary's hd/hd95/assd conventions from
scipy primitives (binary_erosion surface + exact EDT + numpy percentile);
the device path must match it on arbitrary masks.
"""

import numpy as np
import pytest
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"

from ddti_tpu.eval.surface import (
    boundary_map,
    surface_distance_stats_oracle,
    surface_metrics_batch,
)


def _blob(h, w, seed, n_blobs=3):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[:h, :w]
    m = np.zeros((h, w), bool)
    for _ in range(n_blobs):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        r = rng.randint(3, max(h, w) // 3)
        m |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return m


def test_boundary_map_matches_scipy_erosion():
    from scipy import ndimage

    for seed in range(4):
        m = _blob(48, 64, seed)
        ref = m ^ ndimage.binary_erosion(
            m, structure=ndimage.generate_binary_structure(2, 1),
            border_value=0)
        got = np.asarray(boundary_map(m))
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("shape", [(64, 64), (48, 80)])
def test_surface_metrics_match_oracle(shape):
    h, w = shape
    preds = np.stack([_blob(h, w, s) for s in range(5)])
    gts = np.stack([_blob(h, w, s + 100) for s in range(5)])
    got = {k: np.asarray(v)
           for k, v in surface_metrics_batch(preds, gts).items()}
    for j in range(len(preds)):
        ref = surface_distance_stats_oracle(preds[j], gts[j])
        assert got["valid"][j] == ref["valid"]
        for k in ("hd", "hd95", "assd"):
            np.testing.assert_allclose(got[k][j], ref[k], rtol=1e-5,
                                       atol=1e-5, err_msg=f"{k}[{j}]")


def test_identical_masks_are_zero_distance():
    m = _blob(64, 64, 7)
    out = surface_metrics_batch(m[None], m[None])
    assert float(out["valid"][0]) == 1.0
    for k in ("hd", "hd95", "assd"):
        assert float(out[k][0]) == 0.0


def test_empty_masks_are_invalid_nan():
    m = _blob(64, 64, 3)
    empty = np.zeros_like(m)
    for p, g in [(empty, m), (m, empty), (empty, empty)]:
        out = surface_metrics_batch(p[None], g[None])
        assert float(out["valid"][0]) == 0.0
        for k in ("hd", "hd95", "assd"):
            assert np.isnan(float(out[k][0]))


def test_channel_axis_and_soft_gt_binarization():
    """(N,H,W,1) inputs work; soft gt masks binarize as > 0 (the bool
    convention the per-image IoU uses)."""
    p = _blob(64, 64, 1)
    g_soft = _blob(64, 64, 2).astype(np.float32) * 0.4  # soft positives
    out4 = surface_metrics_batch(p[None, ..., None].astype(np.uint8),
                                 g_soft[None, ..., None])
    ref = surface_distance_stats_oracle(p, g_soft > 0)
    np.testing.assert_allclose(float(out4["hd95"][0]), ref["hd95"],
                               rtol=1e-5, atol=1e-5)


def test_trainer_test_reports_surface_metrics(tmp_path):
    """Trainer.test() (surface_metrics=True default) writes hd95/assd
    per-image CSV columns matching the oracle on the model's actual
    predictions, plus aggregate means in test_metrics.json."""
    import csv
    import json
    import math
    import os

    from ddti_tpu.core import Config, create_logger
    from ddti_tpu.data import DeviceDataSource, generate_ddti_like
    from ddti_tpu.models import create_model
    from ddti_tpu.train import Trainer

    cfg = Config(epochs=1, batch_size=4, image_size=32, store_size=32,
                 lr=3e-3, model_type="UNet", base_dir=str(tmp_path))
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
                 for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    m = tr.test(visualize=False)

    with open(os.path.join(cfg.result_dir, "per_image_metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4 and "hd95" in rows[0] and "assd" in rows[0]

    # oracle on the model's own predictions
    logits = model.apply({"params": tr.state.params,
                          "batch_stats": tr.state.batch_stats},
                         np.asarray(srcs[2].images, np.float32) / 255.0,
                         train=False)
    preds = 1 / (1 + np.exp(-np.asarray(logits, np.float32))) > 0.5
    gts = (np.asarray(srcs[2].masks, np.float32) / 255.0) > 0
    hd95_by_idx = {}
    for j in range(4):
        ref = surface_distance_stats_oracle(preds[j, ..., 0],
                                            gts[j, ..., 0])
        hd95_by_idx[j] = ref
    n_valid = 0
    for r in rows:
        ref = hd95_by_idx[int(r["index"])]
        if ref["valid"]:
            n_valid += 1
            np.testing.assert_allclose(float(r["hd95"]), ref["hd95"],
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(float(r["assd"]), ref["assd"],
                                       rtol=1e-4, atol=1e-4)
        else:
            assert math.isnan(float(r["hd95"]))
    with open(os.path.join(cfg.result_dir, "test_metrics.json")) as f:
        tm = json.load(f)
    if n_valid:
        assert tm["surface_valid_images"] == n_valid
        want = np.mean([hd95_by_idx[int(r["index"])]["hd95"] for r in rows
                        if hd95_by_idx[int(r["index"])]["valid"]])
        np.testing.assert_allclose(tm["hd95_mean"], want, rtol=1e-4,
                                   atol=1e-4)
        assert m["hd95_mean"] == tm["hd95_mean"]


def test_edge_touching_foreground_counts_as_surface():
    """A mask filling a full corner: its edge pixels erode away under
    scipy's zero border, so they ARE surface — verify parity there."""
    p = np.zeros((32, 32), bool)
    p[:10, :10] = True
    g = np.zeros((32, 32), bool)
    g[20:, 20:] = True
    out = surface_metrics_batch(p[None], g[None])
    ref = surface_distance_stats_oracle(p, g)
    for k in ("hd", "hd95", "assd"):
        np.testing.assert_allclose(float(out[k][0]), ref[k], rtol=1e-5,
                                   atol=1e-5)

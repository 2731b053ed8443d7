"""Binarization-threshold tuning (--tune_threshold).

Beyond-reference: the torch stack hardcodes sigmoid > 0.5
(/root/reference/utils/trainer.py:102,218); here the operating point can
be selected on the val split with a one-pass device sweep.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ddti_tpu.core import Config  # noqa: E402
from ddti_tpu.data import DeviceDataSource, generate_ddti_like  # noqa: E402
from ddti_tpu.eval.metrics import confusion_counts  # noqa: E402
from ddti_tpu.models import create_model  # noqa: E402
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"
from ddti_tpu.train import (  # noqa: E402
    create_train_state,
    make_threshold_sweep_step,
)


def _setup():
    cfg = Config(batch_size=4, image_size=32, store_size=32, lr=1e-3,
                 model_type="UNet")
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=4)
    im, ma = generate_ddti_like(4, (32, 32), 0)
    return cfg, model, state, jnp.asarray(im), jnp.asarray(ma)


def test_sweep_counts_match_per_threshold_counts():
    cfg, model, state, im, ma = _setup()
    grid = np.asarray([0.2, 0.5, 0.8], np.float32)
    sweep = make_threshold_sweep_step(cfg, grid)
    got = sweep(state, im, ma)
    assert got.tp.shape == (3,)

    logits = model.apply({"params": state.params,
                          "batch_stats": state.batch_stats},
                         im.astype(jnp.float32) / 255.0, train=False)
    masks_f = ma.astype(jnp.float32) / 255.0
    for j, t in enumerate(grid):
        want = confusion_counts(logits, masks_f, threshold=float(t))
        for a, b in zip(got, want):
            assert float(a[j]) == float(b)


def test_trainer_tunes_and_tests_at_argmax(tmp_path):
    from ddti_tpu.core import create_logger
    from ddti_tpu.train.engine import Trainer

    cfg = Config(batch_size=4, image_size=32, store_size=32, lr=1e-3,
                 epochs=1, model_type="UNet", base_dir=str(tmp_path),
                 use_data_parallel=False, tune_threshold=True)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    # val split of 6 with batch 4: the final batch carries 2 wraparound-
    # padded duplicates, which the sweep must weight out (QUIRKS #22)
    srcs = tuple(DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
                 for n, s in ((4, 0), (6, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)

    t = tr.tune_threshold()
    assert 0.05 <= t <= 0.95

    # the chosen threshold is the argmax of the manually-computed val
    # IoU curve
    logits = model.apply({"params": tr.state.params,
                          "batch_stats": tr.state.batch_stats},
                         np.asarray(srcs[1].images, np.float32) / 255.0,
                         train=False)
    probs = 1 / (1 + np.exp(-np.asarray(logits, np.float32)))
    gt = np.asarray(srcs[1].masks, np.float32) / 255.0 > 0
    grid = np.round(np.arange(0.05, 0.951, 0.05), 2)
    ious = [np.logical_and(probs > g, gt).sum()
            / max(np.logical_or(probs > g, gt).sum(), 1e-8) for g in grid]
    assert t == float(grid[int(np.argmax(ious))])

    m = tr.test(visualize=False)
    import json
    with open(os.path.join(cfg.result_dir, "test_metrics.json")) as f:
        saved = json.load(f)
    assert saved["threshold"] == t
    assert 0.0 <= m["iou"] <= 1.0


def test_serving_export_bakes_tuned_threshold(tmp_path):
    """--tune_threshold + --export_serving coherence: the exported serving
    program binarizes at the val-tuned operating point (not the
    reference's hardcoded 0.5), so deployed masks match what test()
    scored; test() then reuses the cached sweep instead of re-running."""
    from ddti_tpu.core import create_logger
    from ddti_tpu.train.engine import Trainer
    from ddti_tpu.train.export import load_serving_bundle

    cfg = Config(batch_size=4, image_size=32, store_size=32, lr=1e-3,
                 epochs=1, model_type="UNet", base_dir=str(tmp_path),
                 use_data_parallel=False, tune_threshold=True,
                 export_serving=True)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(4, (32, 32), s))
                 for s in (0, 1, 2))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)

    x = np.asarray(srcs[1].images, np.float32) / 255.0
    logits = model.apply({"params": tr.state.params,
                          "batch_stats": tr.state.batch_stats},
                         x, train=False)
    probs = 1 / (1 + np.exp(-np.asarray(logits, np.float32)))
    # operating point at the MIDPOINT between two adjacent observed probs:
    # maximally far from every pixel, so host-vs-device sigmoid rounding
    # can never flip the comparison (bitwise mask equality stays robust)
    sp = np.unique(probs.ravel())
    i = min(max(np.searchsorted(sp, np.quantile(probs, 0.75)), 1),
            len(sp) - 1)
    thr = float((sp[i - 1] + sp[i]) / 2)
    # sanity: the pinned operating point actually flips pixels vs 0.5
    assert ((probs > min(thr, 0.5)) & (probs <= max(thr, 0.5))).any()

    tr._tuned_threshold = thr  # pin the sweep result; plumbing under test
    tr._export_serving_artifacts()
    assert tr._serving_threshold() == thr  # export reused the cache

    prog = os.path.join(cfg.model_dir, "UNet_serving_program.stablehlo")
    fn, batch, size, in_dtype = load_serving_bundle(prog)
    assert (batch, size) == (4, 32)
    got = np.asarray(fn(jnp.asarray(x, in_dtype)))
    np.testing.assert_array_equal(got, (probs > thr).astype(np.uint8))
    assert not np.array_equal(got, (probs > 0.5).astype(np.uint8))

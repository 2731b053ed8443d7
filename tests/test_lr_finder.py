"""LR range test (train/lr_finder.py, --lr_find)."""

import pytest
import os

import jax
import numpy as np

from ddti_tpu.core import Config, create_logger
from ddti_tpu.data import DeviceDataSource, generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import Trainer
from ddti_tpu.train.lr_finder import run_lr_finder
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def _trainer(tmp_path, **kw):
    cfg = Config(epochs=1, batch_size=8, image_size=32, store_size=32,
                 lr=1e-5, model_type="UNet", base_dir=str(tmp_path), **kw)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
                 for n, s in ((16, 0), (8, 1), (8, 2)))
    model = create_model("UNet", base_filters=8, depth=2)
    return Trainer(cfg, srcs, logger, model), cfg


def test_lr_finder_artifacts_and_suggestions(tmp_path):
    tr, cfg = _trainer(tmp_path)
    before = jax.tree.map(np.asarray, tr.state.params)
    r = run_lr_finder(tr, num_steps=25, min_lr=1e-6, max_lr=1.0)
    # suggestions inside the swept range
    assert 1e-7 <= r["lr_min_over_10"] <= 1.0
    assert 1e-6 <= r["lr_steepest"] <= 1.0
    assert len(r["history"]) >= 5
    # lrs ramp geometrically upward
    lrs = [h[0] for h in r["history"]]
    assert lrs == sorted(lrs) and lrs[0] == 1e-6
    # artifacts written
    assert os.path.isfile(os.path.join(cfg.result_dir, "lr_find.csv"))
    with open(r["csv"]) as f:
        assert f.readline().strip() == "step,lr,loss,smoothed"
    # the trainer's own state is untouched (sweep ran on copies)
    after = jax.tree.map(np.asarray, tr.state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert int(tr.state.step) == 0


def test_lr_find_cli_exits_without_training(tmp_path, capsys):
    from ddti_tpu.cli.main import main

    assert main(["--synthetic", "--mode", "train", "--image_size", "32",
                 "--store_size", "32", "--model_type", "UNet",
                 "--base_filters", "8", "--depth", "2", "--batch_size", "8",
                 "--lr_find", "20", "--lr_find_min", "1e-6",
                 "--lr_find_max", "0.5",
                 "--base_dir", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "[LR_FIND]" in out
    run = tmp_path / os.listdir(tmp_path)[0]
    assert (run / "result" / "lr_find.csv").is_file()
    # no training happened: no checkpoints were written
    assert not (run / "models" / "UNet_best").exists()
    log = (run / "log" / "train_log.log").read_text()
    assert "LR range test" in log
    assert "Train Epoch" not in log

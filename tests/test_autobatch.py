"""Automatic batch-size selection (train/autobatch.py).

The probe compiles the REAL train step with abstract operands and reads
XLA's buffer assignment — these tests check the prediction is monotone
in batch, the picker respects an explicit budget and grad_accum
divisibility, and the CLI's ``--batch_size auto`` path trains end to end
(beyond the reference, whose batch size is bisected by hand —
/root/reference/main.py:20)."""

import logging
import os

import pytest

from ddti_tpu.core import Config
from ddti_tpu.models import create_model
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"
from ddti_tpu.train.autobatch import (
    device_budget_bytes,
    pick_batch_size,
    predicted_step_peak_bytes,
)


def _tiny():
    cfg = Config(batch_size=4, image_size=32, store_size=32, lr=1e-3,
                 model_type="UNet")
    model = create_model("UNet", in_channels=1, out_channels=1,
                         base_filters=8, depth=2)
    return cfg, model


def test_peak_monotone_in_batch():
    cfg, model = _tiny()
    p2 = predicted_step_peak_bytes(cfg, model, 2)
    p8 = predicted_step_peak_bytes(cfg, model, 8)
    assert 0 < p2 < p8


def test_pick_respects_budget():
    cfg, model = _tiny()
    p2 = predicted_step_peak_bytes(cfg, model, 2)
    budget = int(p2 / 0.92) + 1  # bs2 fits exactly, bs8 cannot
    b = pick_batch_size(cfg, model, candidates=(2, 8, 16),
                        budget_bytes=budget)
    assert b == 2
    # data_parallel scales the per-device pick to a global batch
    b = pick_batch_size(cfg, model, candidates=(2, 8, 16),
                        budget_bytes=budget, data_parallel=4)
    assert b == 8


def test_pick_too_small_budget_raises():
    cfg, model = _tiny()
    with pytest.raises(MemoryError):
        pick_batch_size(cfg, model, candidates=(2,), budget_bytes=1024)


def test_grad_accum_filters_candidates():
    cfg, model = _tiny()
    cfg.grad_accum = 4
    b = pick_batch_size(cfg, model, candidates=(2, 4, 6, 8),
                        budget_bytes=device_budget_bytes())
    assert b % 4 == 0
    with pytest.raises(ValueError):
        pick_batch_size(cfg, model, candidates=(2, 6),
                        budget_bytes=device_budget_bytes())


def test_cli_batch_size_auto_end_to_end(tmp_path, monkeypatch):
    """--batch_size auto resolves against the (patched) device budget and
    the run trains with the selected batch."""
    from ddti_tpu.cli.main import main
    from ddti_tpu.train import autobatch

    cfg, model = _tiny()
    budget = int(predicted_step_peak_bytes(cfg, model, 8) / 0.92) + 1
    monkeypatch.setattr(autobatch, "device_budget_bytes", lambda: budget)
    rc = main(["--mode", "train", "--synthetic", "--epochs", "1",
               "--image_size", "32", "--store_size", "32",
               "--model_type", "UNet", "--base_filters", "8",
               "--depth", "2", "--batch_size", "auto", "--lr", "1e-3",
               "--use_data_parallel", "false",
               "--base_dir", str(tmp_path)])
    assert rc == 0
    run = os.path.join(str(tmp_path), os.listdir(tmp_path)[0])
    log = open(os.path.join(run, "log", "train_log.log")).read()
    assert "[autobatch] selected --batch_size 8" in log


def test_batch_size_arg_parses():
    from ddti_tpu.cli.main import get_parser
    p = get_parser()
    assert p.parse_args(["--batch_size", "auto"]).batch_size == "auto"
    assert p.parse_args(["--batch_size", "32"]).batch_size == 32
    with pytest.raises(SystemExit):
        p.parse_args(["--batch_size", "biggish"])


def test_peak_accounts_for_distill_teacher_and_freeze():
    """--batch_size auto must probe the REAL step: with --distill the
    teacher's weights + forward activations raise the predicted peak
    (probed abstractly — the dummy checkpoint path is never read), and
    the probe must not crash when --freeze/--qat change the state
    structure."""
    import dataclasses

    cfg, model = _tiny()
    base = predicted_step_peak_bytes(cfg, model, 4)
    kd = dataclasses.replace(cfg, distill_checkpoint="never_read.npz",
                             distill_base_filters=16, distill_depth=3)
    with_teacher = predicted_step_peak_bytes(kd, model, 4)
    assert with_teacher > base

    frz = dataclasses.replace(cfg, freeze="encoders")
    assert 0 < predicted_step_peak_bytes(frz, model, 4) <= base

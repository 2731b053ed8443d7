"""Sweep-results aggregator (cli/aggregate.py) — replaces the reference's
hand-pasted IoU comments in test.sh (/root/reference/test.sh:12-20)."""

import json
import os

import yaml

from ddti_tpu.cli.aggregate import collect_runs, main


def _mk_run(root, name, cfg=None, metrics=None, log_blocks=None):
    d = os.path.join(root, name)
    os.makedirs(os.path.join(d, "result"), exist_ok=True)
    os.makedirs(os.path.join(d, "log"), exist_ok=True)
    if cfg is not None:
        with open(os.path.join(d, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg, f)
    if metrics is not None:
        with open(os.path.join(d, "result", "test_metrics.json"), "w") as f:
            json.dump(metrics, f)
    if log_blocks is not None:
        with open(os.path.join(d, "log", "train_log.log"), "w") as f:
            for acc, p, r, f1, iou in log_blocks:
                f.write(f"Test Metrics\n  ACC={acc}, Precision={p}, "
                        f"Recall={r}, F1={f1}, IoU={iou}\n")


def test_collect_prefers_json_and_falls_back_to_log(tmp_path):
    root = str(tmp_path)
    _mk_run(root, "ResUNet_20250101_000000",
            cfg={"model_type": "ResUNet", "base_filters": 64, "depth": 5,
                 "use_mixup": True},
            metrics={"acc": 0.9, "precision": 0.8, "recall": 0.7,
                     "f1": 0.75, "iou": 0.6449, "total_images": 64})
    # log-only legacy run; the LAST block must win
    _mk_run(root, "UNet_20250102_000000",
            cfg={"model_type": "UNet", "base_filters": 32, "depth": 4},
            log_blocks=[(0.5, 0.4, 0.3, 0.35, 0.2),
                        (0.91, 0.82, 0.72, 0.77, 0.61)])
    _mk_run(root, "VNet2D_20250103_000000", cfg={"model_type": "VNet2D"})
    (tmp_path / "not_a_dir.txt").write_text("x")

    rows = collect_runs(root)
    assert [r["run"] for r in rows] == ["ResUNet_20250101_000000",
                                        "UNet_20250102_000000"]
    res, unet = rows
    assert res["iou"] == 0.6449 and res["use_mixup"] is True
    assert res["total_images"] == 64
    assert unet["iou"] == 0.61 and unet["base_filters"] == 32


def test_main_ranks_and_writes_csv(tmp_path, capsys):
    root = str(tmp_path / "exp")
    os.makedirs(root)
    _mk_run(root, "A_1", cfg={"model_type": "A"},
            metrics={"iou": 0.30, "acc": 0.9, "precision": 1, "recall": 1,
                     "f1": 1, "total_images": 4})
    _mk_run(root, "B_1", cfg={"model_type": "B"},
            metrics={"iou": 0.70, "acc": 0.9, "precision": 1, "recall": 1,
                     "f1": 1, "total_images": 4})
    out_csv = str(tmp_path / "summary.csv")
    assert main(["--experiments_dir", root, "--output", out_csv]) == 0
    printed = capsys.readouterr().out
    assert printed.index("B_1") < printed.index("A_1")  # ranked by IoU

    import csv
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert [r["run"] for r in rows] == ["B_1", "A_1"]

    assert main(["--experiments_dir", str(tmp_path / "missing")]) == 1


def test_trainer_writes_test_metrics_json(tmp_path):
    """Trainer.test() leaves the machine-readable metrics twin the
    aggregator consumes."""
    import jax

    from ddti_tpu.core import Config, create_logger
    from ddti_tpu.data import DeviceDataSource, generate_ddti_like
    from ddti_tpu.models import create_model
    from ddti_tpu.train.engine import Trainer

    cfg = Config(batch_size=4, image_size=32, store_size=32, lr=1e-3,
                 epochs=1, model_type="UNet", base_dir=str(tmp_path),
                 use_data_parallel=False)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(4, (32, 32), s))
                 for s in (0, 1, 2))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    m = tr.test(visualize=False)
    with open(os.path.join(cfg.result_dir, "test_metrics.json")) as f:
        saved = json.load(f)
    assert saved["iou"] == float(m["iou"])
    assert saved["model_type"] == "UNet" and saved["total_images"] == 4
    rows = collect_runs(str(tmp_path))
    assert len(rows) == 1 and rows[0]["iou"] == round(float(m["iou"]), 4)

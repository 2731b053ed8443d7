"""Augmentation preview CLI (cli/preview.py)."""

import os

from PIL import Image

from ddti_tpu.cli.preview import main


def test_preview_synthetic_grid(tmp_path):
    out = str(tmp_path / "grid.png")
    assert main(["--synthetic", "--output", out, "--count", "2",
                 "--variants", "3", "--image_size", "32",
                 "--store_size", "32", "--use_speckle", "true",
                 "--use_tgc", "true"]) == 0
    assert os.path.isfile(out)
    im = Image.open(out)
    assert im.width > im.height  # 1+3 columns x 2 rows


def test_preview_from_dataset_tree(tmp_path):
    import numpy as np

    root = tmp_path / "ds"
    for d in ("train", "train_mask"):
        os.makedirs(root / d)
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (24, 24), dtype=np.uint8),
                        "L").save(root / "train" / f"a{i}.jpg")
        Image.fromarray((rng.rand(24, 24) > 0.5).astype(np.uint8) * 255,
                        "L").save(root / "train_mask" / f"a{i}_mask.jpg")
    out = str(tmp_path / "g.png")
    assert main(["--dataset_path", str(root), "--output", out,
                 "--count", "3", "--variants", "2",
                 "--image_size", "24", "--store_size", "24"]) == 0
    assert os.path.isfile(out)

"""Dataset split/prep CLI (cli/split_data.py): pairing, ratio and k-fold
splits, manifest, and that the output tree trains through MedicalDataset."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from ddti_tpu.cli.split_data import find_pairs, main


def _make_flat(root, n=20, size=24, seed=0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size, size), dtype=np.uint8),
                        "L").save(os.path.join(root, f"im{i:03d}.jpg"))
        Image.fromarray((rng.rand(size, size) > 0.5).astype(np.uint8) * 255,
                        "L").save(os.path.join(root, f"im{i:03d}_mask.jpg"))


def test_find_pairs_and_unpaired(tmp_path):
    src = str(tmp_path / "flat")
    _make_flat(src, n=5)
    Image.new("L", (8, 8)).save(os.path.join(src, "orphan.jpg"))
    Image.new("L", (8, 8)).save(os.path.join(src, "ghost_mask.jpg"))
    open(os.path.join(src, "notes.txt"), "w").close()
    pairs, unpaired = find_pairs(src)
    assert len(pairs) == 5
    assert all(m == f"{os.path.splitext(i)[0]}_mask.jpg" for i, m in pairs)
    assert sorted(unpaired) == ["ghost_mask.jpg", "orphan.jpg"]


def test_ratio_split_tree_and_manifest(tmp_path):
    src = str(tmp_path / "flat")
    out = str(tmp_path / "tree")
    _make_flat(src, n=20)
    assert main(["--source", src, "--output", out,
                 "--ratios", "0.6,0.2,0.2", "--seed", "7"]) == 0
    sizes = {}
    for split in ("train", "val", "test"):
        imgs = sorted(os.listdir(os.path.join(out, split)))
        masks = sorted(os.listdir(os.path.join(out, f"{split}_mask")))
        assert len(imgs) == len(masks)
        for i in imgs:  # every image has its mask in the sibling dir
            assert f"{os.path.splitext(i)[0]}_mask.jpg" in masks
        sizes[split] = len(imgs)
    assert sizes == {"train": 12, "val": 4, "test": 4}
    # symlinks by default, resolving to the source files
    one = os.path.join(out, "train", os.listdir(os.path.join(out,
                                                             "train"))[0])
    assert os.path.islink(one) and os.path.isfile(one)
    with open(os.path.join(out, "split_manifest.json")) as f:
        man = json.load(f)
    assert man["seed"] == 7 and man["ratios"] == [0.6, 0.2, 0.2]
    all_names = [n for s in man["splits"].values() for n in s]
    assert len(all_names) == 20 and len(set(all_names)) == 20


def test_split_deterministic_and_disjoint(tmp_path):
    src = str(tmp_path / "flat")
    _make_flat(src, n=15)
    outs = []
    for sub in ("a", "b"):
        out = str(tmp_path / sub)
        assert main(["--source", src, "--output", out, "--seed", "3"]) == 0
        with open(os.path.join(out, "split_manifest.json")) as f:
            outs.append(json.load(f)["splits"])
    assert outs[0] == outs[1]  # same seed -> same split
    tr, va, te = (set(outs[0][s]) for s in ("train", "val", "test"))
    assert not (tr & va or tr & te or va & te)


def test_kfold_folds_cover_and_rotate(tmp_path):
    src = str(tmp_path / "flat")
    _make_flat(src, n=10)
    tests = []
    for fold in range(5):
        out = str(tmp_path / f"fold{fold}")
        assert main(["--source", src, "--output", out, "--seed", "1",
                     "--kfold", "5", "--fold", str(fold)]) == 0
        with open(os.path.join(out, "split_manifest.json")) as f:
            man = json.load(f)["splits"]
        assert len(man["test"]) == 2 and len(man["val"]) == 2
        assert len(man["train"]) == 6
        tests.append(frozenset(man["test"]))
    # the K test folds partition the dataset
    assert len(set(tests)) == 5
    assert len(frozenset.union(*tests)) == 10


def test_copy_mode_and_separate_mask_dir(tmp_path):
    img_dir = str(tmp_path / "imgs")
    mask_dir = str(tmp_path / "masks")
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    for i in range(6):
        Image.new("L", (8, 8), i * 10).save(
            os.path.join(img_dir, f"x{i}.png"))
        Image.new("L", (8, 8), 255).save(
            os.path.join(mask_dir, f"x{i}_mask.png"))
    out = str(tmp_path / "tree")
    assert main(["--source", img_dir, "--masks", mask_dir,
                 "--output", out, "--copy",
                 "--ratios", "0.5,0.25,0.25"]) == 0
    one = os.path.join(out, "train",
                       os.listdir(os.path.join(out, "train"))[0])
    assert os.path.isfile(one) and not os.path.islink(one)


def test_output_tree_loads_as_medical_dataset(tmp_path):
    """The produced tree is directly consumable by the data layer (the
    same pairing convention the training CLI uses)."""
    from ddti_tpu.data.dataset import MedicalDataset

    src = str(tmp_path / "flat")
    out = str(tmp_path / "tree")
    _make_flat(src, n=12)
    assert main(["--source", src, "--output", out]) == 0
    ds = MedicalDataset(os.path.join(out, "train"),
                        os.path.join(out, "train_mask"))
    assert len(ds) > 0
    img, mask = ds[0]
    assert img.size == mask.size


def test_bad_args(tmp_path):
    src = str(tmp_path / "flat")
    _make_flat(src, n=4)
    out = str(tmp_path / "o")
    assert main(["--source", src, "--output", out,
                 "--ratios", "0.9,0.2,0.2"]) == 1
    assert main(["--source", src, "--output", out,
                 "--kfold", "99"]) == 1
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    assert main(["--source", empty, "--output", out]) == 1

"""Real-DDTI ingestion gate — runs only when an actual DDTI tree is
mounted (the dataset is not redistributable; synthetic JPEGs cover this
path in CI). Point DDTI_DATA_DIR at a directory with the reference layout

    train/ train_mask/ val/ val_mask/ test/ test_mask/

(each holding <name>.jpg / <name>_mask.jpg pairs,
/root/reference/data/data_loader.py:9-27). Validates pairing, PIL-vs-native
decode agreement, store caching bit-exactness, and one real training epoch.
The full 0.6449-IoU parity recipe is documented in DDTI.md.
"""

import os

import numpy as np
import pytest

DATA = os.environ.get("DDTI_DATA_DIR", "")
SPLITS = ("train", "val", "test")
HAVE = DATA and all(
    os.path.isdir(os.path.join(DATA, s)) for s in SPLITS) and all(
    os.path.isdir(os.path.join(DATA, f"{s}_mask")) for s in SPLITS)

pytestmark = pytest.mark.skipif(
    not HAVE, reason="real DDTI tree not mounted (set DDTI_DATA_DIR)")


def test_pairing_and_decode(tmp_path):
    from PIL import Image

    from ddti_tpu.data import MedicalDataset, decode_to_store

    ds = MedicalDataset(os.path.join(DATA, "train"),
                        os.path.join(DATA, "train_mask"))
    assert len(ds) > 0
    for img_name, mask_name in zip(ds.img_names[:20], ds.mask_names[:20]):
        assert mask_name == img_name.replace(".jpg", "_mask.jpg")

    # PIL oracle vs the native libjpeg path on the first few real files
    imgs_pil, masks_pil = decode_to_store(
        MedicalDataset(ds.img_dir, ds.mask_dir), (256, 256),
        use_native=False)
    imgs_nat, _ = decode_to_store(
        MedicalDataset(ds.img_dir, ds.mask_dir), (256, 256),
        use_native=True)
    # grayscale JPEGs match within 1 level; RGB-encoded ones a few levels
    # (libtpu Y-channel vs PIL YCbCr->RGB->L round trip)
    diff = np.abs(imgs_pil.astype(np.int16) - imgs_nat.astype(np.int16))
    assert float(np.quantile(diff, 0.999)) <= 4.0
    assert masks_pil.max() > 0  # masks decoded, non-empty

    # cache round trip is bit-exact
    cache = str(tmp_path / "cache")
    a, b = decode_to_store(ds, (256, 256), cache_dir=cache)
    c, d = decode_to_store(ds, (256, 256), cache_dir=cache)  # from cache
    np.testing.assert_array_equal(a, c)
    np.testing.assert_array_equal(b, d)


def test_one_epoch_on_real_data(tmp_path):
    from ddti_tpu.cli.main import main

    rc = main(["--mode", "train", "--epochs", "1", "--image_size", "256",
               "--store_size", "256", "--model_type", "ResUNet",
               "--base_filters", "16", "--depth", "3", "--batch_size", "8",
               "--lr", "1e-4", "--dataset_path", DATA,
               "--base_dir", str(tmp_path)])
    assert rc == 0
    run = tmp_path / os.listdir(tmp_path)[0]
    log = (run / "log" / "train_log.log").read_text()
    assert "Train Epoch: 1" in log and "IoU" in log

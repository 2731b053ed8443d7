"""Native C++ host-loader tests (builds libhostloader.so with g++)."""

import shutil

import numpy as np
import pytest

from ddti_tpu.data import generate_ddti_like

if shutil.which("g++") is None and shutil.which("c++") is None:
    pytest.skip("no C++ toolchain", allow_module_level=True)

from ddti_tpu.runtime import NativeBatchLoader, native_available, write_store

if not native_available():
    pytest.skip("native loader failed to build", allow_module_level=True)


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("store")
    images, masks = generate_ddti_like(10, (32, 32), 0)
    paths = write_store(str(d / "ds"), images, masks)
    return paths, images, masks


def test_batches_cover_epoch(store):
    (ip, mp), images, masks = store
    n, batch = 10, 4
    with NativeBatchLoader(ip, mp, n, 32, 32, batch, seed=7) as ld:
        assert ld.steps_per_epoch == 3
        seen = []
        for _ in range(ld.steps_per_epoch):
            bi, bm, epoch = ld.next()
            assert epoch == 0
            assert bi.shape == (batch, 32, 32, 1)
            # every batch row must be an exact dataset row, masks aligned
            for j in range(batch):
                match = np.where(
                    (images[:, :, :, 0] == bi[j, :, :, 0]).all(axis=(1, 2))
                )[0]
                assert len(match) >= 1
                idx = int(match[0])
                np.testing.assert_array_equal(bm[j, :, :, 0],
                                              masks[idx, :, :, 0])
                seen.append(idx)
        # 3 batches of 4 over 10 items with wrap padding: all items appear
        assert set(range(10)).issubset(set(seen))


def test_deterministic_given_seed(store):
    (ip, mp), _, _ = store
    def first_batch(seed):
        with NativeBatchLoader(ip, mp, 10, 32, 32, 4, seed=seed,
                               num_threads=1) as ld:
            bi, _, _ = ld.next()
            return bi.copy()

    np.testing.assert_array_equal(first_batch(3), first_batch(3))
    assert not np.array_equal(first_batch(3), first_batch(4))


def test_multiple_epochs_reshuffle(store):
    (ip, mp), _, _ = store
    with NativeBatchLoader(ip, mp, 10, 32, 32, 4, seed=1,
                           num_threads=1) as ld:
        epochs = [ld.next()[2] for _ in range(7)]
    assert epochs == [0, 0, 0, 1, 1, 1, 2]


def test_zero_steps_rejected(store):
    """drop_last with n < batch (and any empty store) must fail loader
    creation cleanly — regression: a worker thread divided by
    steps_per_epoch == 0 and SIGFPE'd the whole process."""
    (ip, mp), _, _ = store
    with pytest.raises(OSError):
        NativeBatchLoader(ip, mp, 10, 32, 32, batch=32, drop_last=True)


def test_multithreaded_delivery_is_ordered(store):
    """Batches arrive in (epoch, step) ticket order regardless of worker
    count — regression: completion-order delivery interleaved epochs and
    broke run-to-run determinism for num_threads > 1."""
    (ip, mp), _, _ = store

    def run(threads):
        out = []
        with NativeBatchLoader(ip, mp, 10, 32, 32, 4, seed=11,
                               num_threads=threads, queue_depth=3) as ld:
            for _ in range(3 * ld.steps_per_epoch):
                bi, _, epoch = ld.next()
                out.append((epoch, bi.copy()))
        return out

    a, b = run(1), run(4)
    assert [e for e, _ in a] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert [e for e, _ in b] == [e for e, _ in a]
    for (_, x), (_, y) in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_bad_path_raises():
    with pytest.raises(OSError):
        NativeBatchLoader("/nonexistent/a.u8", "/nonexistent/b.u8",
                          4, 8, 8, 2)


def test_native_source_feeds_trainer(tmp_path):
    """NativeBatchLoader as a Trainer streaming source (uint8 batches go
    through the full device augmentation step)."""
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    from ddti_tpu.core import Config, create_logger
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.models import create_model
    from ddti_tpu.runtime import NativeSource
    from ddti_tpu.train import Trainer

    images, masks = generate_ddti_like(8, (32, 32), 1)
    ip, mp = write_store(str(tmp_path / "tr"), images, masks)
    cfg = Config(epochs=1, batch_size=4, image_size=32, store_size=32,
                 lr=1e-3, model_type="UNet", base_dir=str(tmp_path))
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
    train_src = NativeSource(NativeBatchLoader(ip, mp, 8, 32, 32, 4,
                                               num_threads=1))
    eval_srcs = [DeviceDataSource(*generate_ddti_like(4, (32, 32), s))
                 for s in (2, 3)]
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, (train_src, *eval_srcs), logger, model)
    tr.train_one_epoch(0)
    loss, iou = tr.validate(0)
    assert np.isfinite(loss)
    train_src.loader.close()


# ---------------------------------------------------------------------------
# native JPEG ingestion (decode_jpegs: libjpeg decode + PIL-convention
# triangle resize in C++ threads)

@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(3)
    paths = []
    for i, (h, w) in enumerate([(300, 400), (512, 512), (123, 77)]):
        a = rng.integers(0, 256, (h, w), dtype=np.uint8)
        p = str(d / f"g{i}.jpg")
        Image.fromarray(a, "L").save(p, quality=92)
        paths.append(p)
    return paths


@pytest.mark.parametrize("target", [(512, 512), (256, 256), (600, 600)])
def test_decode_jpegs_matches_pil(jpeg_dir, target):
    """Grayscale JPEGs through the native path match PIL's
    convert('L').resize(BILINEAR) within one gray level at down-, up- and
    same-scale targets."""
    from PIL import Image
    from ddti_tpu.runtime import decode_jpegs

    h, w = target
    got = decode_jpegs(jpeg_dir, h, w)
    assert got.shape == (len(jpeg_dir), h, w, 1)
    for i, p in enumerate(jpeg_dir):
        ref = np.asarray(Image.open(p).convert("L")
                         .resize((w, h), Image.BILINEAR)).astype(int)
        diff = np.abs(got[i, ..., 0].astype(int) - ref)
        assert diff.max() <= 1, f"{p}: max diff {diff.max()}"


def test_decode_jpeg_bytes_matches_pil(jpeg_dir):
    """The in-memory single-frame decoder (the serving daemon's hot path)
    matches PIL within one gray level and reports the original size in
    PIL's Image.size (w, h) order."""
    from PIL import Image
    from ddti_tpu.runtime.native import decode_jpeg_bytes

    for p in jpeg_dir:
        data = open(p, "rb").read()
        got, orig = decode_jpeg_bytes(data, 128, 128)
        pil = Image.open(p).convert("L")
        assert orig == pil.size
        ref = np.asarray(pil.resize((128, 128), Image.BILINEAR)).astype(int)
        assert got.shape == (128, 128, 1)
        assert np.abs(got[..., 0].astype(int) - ref).max() <= 1


def test_decode_jpeg_bytes_bad_data_raises():
    from ddti_tpu.runtime.native import decode_jpeg_bytes

    with pytest.raises(ValueError):
        decode_jpeg_bytes(b"definitely not a jpeg", 64, 64)


def test_decode_jpegs_missing_file_raises(jpeg_dir, tmp_path):
    from ddti_tpu.runtime import decode_jpegs

    with pytest.raises(OSError, match="failed for 1 of"):
        decode_jpegs(jpeg_dir + [str(tmp_path / "nope.jpg")], 64, 64)


def test_decode_to_store_native_matches_pil(tmp_path):
    """decode_to_store's native JPEG fast path agrees with the PIL oracle
    within one level on a filename-paired dataset layout."""
    from PIL import Image
    from ddti_tpu.data import MedicalDataset
    from ddti_tpu.data.dataset import decode_to_store

    img_d, mask_d = tmp_path / "imgs", tmp_path / "masks"
    img_d.mkdir(), mask_d.mkdir()
    images, masks = generate_ddti_like(6, (96, 96), 1)
    for i in range(6):
        Image.fromarray(images[i, ..., 0], "L").save(
            str(img_d / f"case{i}.jpg"), quality=95)
        Image.fromarray(masks[i, ..., 0], "L").save(
            str(mask_d / f"case{i}_mask.jpg"), quality=95)

    ds = MedicalDataset(str(img_d), str(mask_d))
    im_nat, ma_nat = decode_to_store(ds, (64, 64), use_native=True)
    im_pil, ma_pil = decode_to_store(ds, (64, 64), use_native=False)
    assert np.abs(im_nat.astype(int) - im_pil.astype(int)).max() <= 1
    assert np.abs(ma_nat.astype(int) - ma_pil.astype(int)).max() <= 1

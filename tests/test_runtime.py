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


def test_bad_path_raises():
    with pytest.raises(OSError):
        NativeBatchLoader("/nonexistent/a.u8", "/nonexistent/b.u8",
                          4, 8, 8, 2)

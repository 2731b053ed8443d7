"""Dataset + device-resident data source.

``MedicalDataset`` mirrors the reference's filename-pairing dataset
(/root/reference/data/data_loader.py:9-27): every image ``<name>.jpg`` in
``img_dir`` pairs with ``<name>_mask.jpg`` in ``mask_dir``.

TPU-first loading model: DDTI is small (hundreds of ultrasound frames), so
the idiomatic design is a **device-resident store** — decode once on the
host to a canonical uint8 resolution, push the whole dataset to HBM, and do
all batching/augmentation on device (zero host<->device traffic per step,
no DataLoader worker processes). ``HostBatchIterator`` provides a streaming
fallback for datasets that outgrow HBM, with the host augmentation oracle.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator

import numpy as np

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

import jax
import jax.numpy as jnp


class MedicalDataset:
    """Filename-paired (image, mask) dataset with lazy PIL decode."""

    def __init__(self, img_dir: str, mask_dir: str, transform=None):
        self.img_dir = str(img_dir)
        self.mask_dir = str(mask_dir)
        # flat listing (the reference pairs a flat directory,
        # data_loader.py:13-14); a recursive walk would list files whose
        # joined path doesn't exist
        self.img_names = [p.name for p in sorted(Path(img_dir).iterdir())
                          if p.is_file()]
        self.mask_names = [n.split(".jpg")[0] + "_mask.jpg"
                           for n in self.img_names]
        self.transform = transform

    def __len__(self):
        return len(self.img_names)

    def open_pair(self, idx: int):
        img = Image.open(os.path.join(self.img_dir, self.img_names[idx]))
        mask = Image.open(os.path.join(self.mask_dir, self.mask_names[idx]))
        return img, mask

    def __getitem__(self, idx: int):
        img, mask = self.open_pair(idx)
        if self.transform is not None:
            return self.transform(img, mask)
        return img, mask


def store_cache_paths(dataset: MedicalDataset, store_size=(512, 512),
                      cache_dir: str = ".store_cache") -> tuple[str, str]:
    """THE cache key for a dataset's decoded ``.u8`` store (shared by
    ``decode_to_store`` and ``decode_to_store_files`` — one derivation, so
    the array and streaming paths always agree). Keys on directory paths +
    per-file (name, size, mtime): a renamed/replaced/regenerated dataset
    never hits a stale store (a name-and-count-only tag collides across
    datasets)."""
    import hashlib

    h, w = store_size
    sig = hashlib.sha1()
    for d in (dataset.img_dir, dataset.mask_dir):
        sig.update(os.path.abspath(d).encode())
    for names, d in ((dataset.img_names, dataset.img_dir),
                     (dataset.mask_names, dataset.mask_dir)):
        for nm in names:
            st = os.stat(os.path.join(d, nm))
            sig.update(f"{nm}:{st.st_size}:{st.st_mtime_ns}".encode())
    tag = (f"{os.path.basename(dataset.img_dir)}_{len(dataset)}_{h}x{w}_"
           f"{sig.hexdigest()[:16]}")
    return (os.path.join(cache_dir, f"{tag}_imgs.u8"),
            os.path.join(cache_dir, f"{tag}_masks.u8"))


def decode_to_store(dataset: MedicalDataset, store_size=(512, 512),
                    dtype=np.uint8, cache_dir: str | None = None,
                    use_native: bool = True
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Decode + canonical-resize the whole dataset to two uint8 arrays
    (N, H, W, 1). Grayscale ('L') conversion like PIL gives for DDTI jpgs.

    With ``cache_dir`` the decoded store is memoized as raw ``.u8`` files
    (the native-loader format), so subsequent runs skip decoding entirely.

    ``use_native`` (default) ingests all-JPEG datasets through the C++
    libjpeg path (parallel decode + PIL-convention resize). Grayscale
    JPEGs match PIL within +-1 level; RGB-encoded JPEGs can differ by a
    few levels because libjpeg reads the Y channel directly while PIL
    round-trips YCbCr->RGB->L. Pass ``use_native=False`` for the strict
    PIL oracle.
    """
    h, w = store_size
    n = len(dataset)
    if cache_dir:
        ip, mp = store_cache_paths(dataset, store_size, cache_dir)
        if (os.path.isfile(ip) and os.path.isfile(mp)
                and os.path.getsize(ip) == n * h * w
                and os.path.getsize(mp) == n * h * w):
            images = np.fromfile(ip, np.uint8).reshape(n, h, w, 1)
            masks = np.fromfile(mp, np.uint8).reshape(n, h, w, 1)
            return images, masks
    images, masks = None, None
    img_paths = [os.path.join(dataset.img_dir, nm)
                 for nm in dataset.img_names]
    mask_paths = [os.path.join(dataset.mask_dir, nm)
                  for nm in dataset.mask_names]
    if use_native and dtype == np.uint8 and all(
            p.lower().endswith((".jpg", ".jpeg"))
            for p in img_paths + mask_paths):
        # native cold-start path: parallel libjpeg decode + PIL-convention
        # resize in C++ threads (runtime/host_loader.cpp:decode_jpegs)
        try:
            from ddti_tpu.runtime import decode_jpegs, native_available
            if native_available():
                images = decode_jpegs(img_paths, h, w)
                masks = decode_jpegs(mask_paths, h, w)
        except Exception:
            images, masks = None, None  # fall back to PIL below
    if images is None:
        images = np.zeros((n, h, w, 1), dtype)
        masks = np.zeros((n, h, w, 1), dtype)
        for i in range(n):
            img, mask = dataset.open_pair(i)
            img = img.convert("L").resize((w, h), Image.BILINEAR)
            mask = mask.convert("L").resize((w, h), Image.BILINEAR)
            images[i, ..., 0] = np.asarray(img, dtype)
            masks[i, ..., 0] = np.asarray(mask, dtype)
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        images[..., 0].tofile(ip)
        masks[..., 0].tofile(mp)
    return images, masks


def decode_to_store_files(dataset: MedicalDataset, store_size=(512, 512),
                          cache_dir: str = ".store_cache"
                          ) -> tuple[str, str, int]:
    """Ensure the raw ``.u8`` store files for ``dataset`` exist (decoding
    if needed) and return ``(imgs_path, masks_path, n)`` — the handles the
    native threaded batch loader mmaps. This is the streaming-ingestion
    entry: the arrays never need to stay resident in host or device memory
    (contrast decode_to_store, which returns them)."""
    h, w = store_size
    n = len(dataset)
    ip, mp = store_cache_paths(dataset, store_size, cache_dir)
    if not (os.path.isfile(ip) and os.path.isfile(mp)
            and os.path.getsize(ip) == n * h * w
            and os.path.getsize(mp) == n * h * w):
        decode_to_store(dataset, store_size, cache_dir=cache_dir)
    return ip, mp, n


class DeviceDataSource:
    """The whole dataset resident in device memory as uint8; per-step
    batches are device-side gathers (uint8 -> float conversion happens in
    the jitted step, so HBM holds 1 byte/pixel)."""

    def __init__(self, images: np.ndarray, masks: np.ndarray,
                 sharding=None, names=None):
        assert images.ndim == 4 and masks.ndim == 4
        self.n = images.shape[0]
        # optional per-item identifiers (dataset filenames) for audit
        # outputs like the per-image test-metrics CSV
        self.names = list(names) if names is not None else None
        if sharding is not None:
            self.images = jax.device_put(jnp.asarray(images), sharding)
            self.masks = jax.device_put(jnp.asarray(masks), sharding)
        else:
            self.images = jnp.asarray(images)
            self.masks = jnp.asarray(masks)

    def epoch_batches(self, rng: np.random.Generator, batch_size: int,
                      shuffle: bool = True, drop_last: bool = False
                      ) -> Iterator[np.ndarray]:
        """Yield index arrays for one epoch (host-side; the gather itself
        happens inside the jitted step). The final short batch is padded by
        wraparound unless dropped — static shapes for XLA."""
        order = (rng.permutation(self.n) if shuffle
                 else np.arange(self.n))
        for start in range(0, self.n, batch_size):
            idx = order[start:start + batch_size]
            if len(idx) < batch_size:
                if drop_last:
                    return
                pad = order[: batch_size - len(idx)]
                idx = np.concatenate([idx, pad])
            yield idx

    def num_batches(self, batch_size: int, drop_last: bool = False) -> int:
        if drop_last:
            return self.n // batch_size
        return -(-self.n // batch_size)


def synthetic_source(n: int, store_size=(512, 512), seed: int = 0
                     ) -> DeviceDataSource:
    from .synthetic import generate_ddti_like
    images, masks = generate_ddti_like(n, store_size, seed)
    return DeviceDataSource(images, masks)


class HostBatchIterator:
    """Streaming host loader (PIL decode + host transform chain per item),
    for datasets too large for the device store or for strict host-oracle
    augmentation. Single-process; shuffling via numpy rng."""

    def __init__(self, dataset: MedicalDataset, batch_size: int,
                 shuffle: bool, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = None
        self.rng = np.random.default_rng(seed)

    def set_epoch(self, epoch: int) -> None:
        """Pin the next iteration's randomness to (seed, epoch) — the
        Trainer calls this per train epoch so a --resume run replays the
        exact order/transform stream the uninterrupted run would have had
        (the default stateful stream would restart from the seed)."""
        self._epoch = int(epoch)

    def __iter__(self):
        import random as _random
        rng = (np.random.default_rng((self.seed, self._epoch))
               if self._epoch is not None else self.rng)
        order = (rng.permutation(len(self.dataset)) if self.shuffle
                 else np.arange(len(self.dataset)))
        host_rng = _random.Random(int(rng.integers(2 ** 31)))
        batch_imgs, batch_masks = [], []
        for i in order:
            img, mask = self.dataset.open_pair(int(i))
            if self.dataset.transform is not None:
                im, ma = self.dataset.transform(img, mask, host_rng)
            else:
                im, ma = (np.asarray(img, np.float32)[..., None] / 255.0,
                          np.asarray(mask, np.float32)[..., None] / 255.0)
            batch_imgs.append(im)
            batch_masks.append(ma)
            if len(batch_imgs) == self.batch_size:
                yield np.stack(batch_imgs), np.stack(batch_masks)
                batch_imgs, batch_masks = [], []
        if batch_imgs:
            yield np.stack(batch_imgs), np.stack(batch_masks)

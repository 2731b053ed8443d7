"""ctypes bindings + auto-build for the native host loader
(host_loader.cpp). No pybind11 dependency — plain C ABI.

Usage:
    from ddti_tpu.runtime import NativeBatchLoader
    with NativeBatchLoader(imgs_path, masks_path, n, h, w, batch) as ld:
        imgs, masks, epoch = ld.next()
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libhostloader.so")
_build_lock = threading.Lock()
_lib = None


def _stale() -> bool:
    """The .so must be rebuilt when missing OR older than its source —
    a prebuilt library from before a C-ABI addition (e.g. decode_jpeg_mem)
    would otherwise make ctypes binding fail at _load()."""
    if not os.path.isfile(_LIB_PATH):
        return True
    src = os.path.join(_HERE, "host_loader.cpp")
    return os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)


def build_library(force: bool = False) -> str:
    """Compile libhostloader.so with make/g++ if missing or older than its
    source. Guarded by a thread lock AND a cross-process file lock:
    concurrent processes (multi-host launches, parallel test workers) must
    not run `make` on the same .so at once — one would dlopen a
    half-written library."""
    with _build_lock:
        if not force and not _stale():
            return _LIB_PATH
        import fcntl
        with open(os.path.join(_HERE, ".build.lock"), "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if force or _stale():
                    subprocess.run(["make", "-C", _HERE, "-s"]
                                   + (["-B"] if force else []),
                                   check=True, capture_output=True)
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.loader_next.restype = ctypes.c_long
        lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_void_p]
        lib.loader_destroy.restype = None
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.decode_jpegs.restype = ctypes.c_long
        lib.decode_jpegs.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int]
        lib.decode_jpeg_mem.restype = ctypes.c_long
        lib.decode_jpeg_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    return _lib


def decode_jpegs(paths, h: int, w: int,
                 num_threads: int | None = None) -> np.ndarray:
    """Decode a list of JPEG files to grayscale and resize each to (h, w)
    with PIL-BILINEAR semantics, in parallel C++ threads (libjpeg). Returns
    a (N, h, w, 1) uint8 array. Raises on any undecodable file.

    This is the native cold-start ingestion path: the equivalent of
    ``Image.open().convert("L").resize((w, h), BILINEAR)`` per file
    (reference behavior at /root/reference/utils/transforms.py:143-150 +
    data_loader.py:20-27) without touching PIL.
    """
    lib = _load()
    paths = [os.fspath(p) for p in paths]
    n = len(paths)
    out = np.empty((n, h, w, 1), np.uint8)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    if num_threads is None:
        num_threads = min(16, os.cpu_count() or 1)
    ok = lib.decode_jpegs(blob, n, h, w,
                          out.ctypes.data_as(ctypes.c_void_p), num_threads)
    if ok != n:
        raise OSError(f"native JPEG decode failed for {n - ok} of {n} files")
    return out


def decode_jpeg_bytes(data: bytes, h: int, w: int):
    """Decode ONE in-memory JPEG to grayscale and resize to (h, w) with
    PIL-BILINEAR semantics. Returns ``((h, w, 1) uint8 array,
    (orig_w, orig_h))`` — the original size in PIL's ``Image.size`` order.
    Raises ValueError on undecodable bytes.

    The serving daemon's per-request hot path: equivalent of
    ``Image.open(BytesIO(data)).convert("L").resize((w, h), BILINEAR)``
    without PIL (both ride libjpeg, so decoded pixels are identical)."""
    lib = _load()
    out = np.empty((h, w, 1), np.uint8)
    oh = ctypes.c_int(0)
    ow = ctypes.c_int(0)
    ok = lib.decode_jpeg_mem(data, len(data), h, w,
                             out.ctypes.data_as(ctypes.c_void_p),
                             ctypes.byref(oh), ctypes.byref(ow))
    if ok != 1:
        raise ValueError("native JPEG decode failed")
    return out, (ow.value, oh.value)


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


class NativeBatchLoader:
    """Threaded mmap-backed batch assembler over a raw uint8 store.

    Yields (batch, H, W, 1) uint8 image/mask arrays with deterministic
    per-epoch shuffling (seed ^ f(epoch)); the final short batch of each
    epoch wraps around, matching DeviceDataSource.epoch_batches semantics.
    """

    def __init__(self, imgs_path: str, masks_path: str, n: int, h: int,
                 w: int, batch: int, seed: int = 0, num_threads: int = 2,
                 queue_depth: int = 4, drop_last: bool = False):
        self._lib = _load()
        self.n, self.h, self.w, self.batch = n, h, w, batch
        self._handle = self._lib.loader_create(
            imgs_path.encode(), masks_path.encode(), n, h, w, batch,
            seed, num_threads, queue_depth, int(drop_last))
        if not self._handle:
            raise OSError(f"loader_create failed for {imgs_path!r} / "
                          f"{masks_path!r} (size/permissions?)")
        self.steps_per_epoch = (n // batch if drop_last
                                else -(-n // batch))

    def next(self):
        imgs = np.empty((self.batch, self.h, self.w, 1), np.uint8)
        masks = np.empty((self.batch, self.h, self.w, 1), np.uint8)
        epoch = self._lib.loader_next(
            self._handle,
            imgs.ctypes.data_as(ctypes.c_void_p),
            masks.ctypes.data_as(ctypes.c_void_p))
        if epoch < 0:
            raise StopIteration
        return imgs, masks, int(epoch)

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativeSource:
    """Adapter exposing a NativeBatchLoader as a Trainer-compatible
    streaming source: iterating yields one epoch of (imgs, masks) uint8
    batches (the device pipeline then augments them)."""

    def __init__(self, loader: NativeBatchLoader):
        self.loader = loader
        self.batch_size = loader.batch

    def num_batches(self, batch_size: int | None = None) -> int:
        """Steps per epoch (Trainer schedule sizing)."""
        if batch_size not in (None, self.loader.batch):
            raise ValueError(f"native loader was built for batch "
                             f"{self.loader.batch}, got {batch_size}")
        return self.loader.steps_per_epoch

    def __iter__(self):
        for _ in range(self.loader.steps_per_epoch):
            try:
                imgs, masks, _ = self.loader.next()
            except StopIteration:
                # loader stopped (closed concurrently): end the epoch
                # cleanly — a StopIteration escaping a generator body is
                # a RuntimeError under PEP 479
                return
            yield imgs, masks


def write_store(path_prefix: str, images: np.ndarray, masks: np.ndarray
                ) -> tuple[str, str]:
    """Write (N, H, W, 1) uint8 arrays as raw store files for the native
    loader; returns (imgs_path, masks_path)."""
    assert images.dtype == np.uint8 and masks.dtype == np.uint8
    imgs_path = path_prefix + "_imgs.u8"
    masks_path = path_prefix + "_masks.u8"
    images[..., 0].tofile(imgs_path)
    masks[..., 0].tofile(masks_path)
    return imgs_path, masks_path

"""Logger factory and metric writers.

Mirrors /root/reference/utils/utils.py:125-171: a ``logging`` logger with
UTC+8 timestamps, INFO console handler and DEBUG file handler; plus a thin
TensorBoard scalar writer (tensorboardX, gated) matching the reference's
SummaryWriter usage (9 scalars per phase, /root/reference/utils/trainer.py
:111-119,162-170).
"""

from __future__ import annotations

import logging
import time
from datetime import datetime, timedelta, timezone


def create_logger(filename: str, console: bool = True) -> logging.Logger:
    """``console=False`` logs to the file only (library-API quiet mode,
    ddti_tpu.api.fit(verbose=False)); the reference always attaches both
    handlers (/root/reference/utils/utils.py:125-171)."""
    def utc8(*args):
        return (datetime.now(tz=timezone.utc) + timedelta(hours=8)).timetuple()

    logger = logging.getLogger(filename)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:  # idempotent across repeated calls in one process
        return logger

    fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
    fmt.converter = utc8

    if console:
        ch = logging.StreamHandler()
        ch.setLevel(logging.INFO)
        ch.setFormatter(fmt)
        logger.addHandler(ch)

    fh = logging.FileHandler(filename)
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger


class ScalarWriter:
    """TensorBoard scalar writer; silently no-ops if tensorboardX is
    unavailable."""

    def __init__(self, log_dir: str):
        self._w = None
        try:
            from tensorboardX import SummaryWriter
            self._w = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int) -> None:
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def close(self) -> None:
        if self._w is not None:
            self._w.close()


class StepTimer:
    """Wall-clock step timer with warmup skip, for images/sec accounting."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
            self._items = getattr(self, "_items", 0) + n_items
        return dt

    @property
    def items_per_sec(self) -> float:
        if self.total <= 0:
            return 0.0
        return getattr(self, "_items", 0) / self.total

"""The training/eval engine — capability mirror of the reference Trainer
(/root/reference/utils/trainer.py) rebuilt around jitted device steps.

Differences by design (all TPU-first):
 - augmentation, losses, metrics run inside the jitted step on device;
 - per-epoch metrics come from accumulated device confusion counts
   (four scalars per step cross the host boundary, not full tensors);
 - data parallelism is a mesh sharding, not a module wrapper: batches are
   sharded over the "data" axis, state is replicated, XLA emits the ICI
   collectives (replaces nn.DataParallel, trainer.py:28-32);
 - checkpoints are Orbax (full state) plus .npz weight exports, with
   best-by-val-IoU and last-epoch policy (trainer.py:184-202);
 - bf16 compute replaces CUDA AMP (no loss scaling needed on TPU).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ddti_tpu.core.logging import ScalarWriter
from ddti_tpu.data.augment import AugmentConfig
from ddti_tpu.data.dataset import DeviceDataSource
from ddti_tpu.eval.metrics import epoch_metrics_from_counts, metrics_from_counts
from ddti_tpu.eval.visualize import save_boundary_grids
from ddti_tpu.utils import EarlyStopping
from .checkpoint import (ManagedCheckpointer, save_checkpoint,
                         save_params_npz)
from .state import TrainState, create_train_state
from .steps import (
    accumulate,
    gather_batch,
    make_eval_step,
    make_host_train_step,
    make_infer_step,
    make_scan_epoch,
    make_train_step,
)


@jax.jit
def _snapshot(tree):
    """Donation-safe copy of a pytree in ONE device dispatch (jit caches
    per tree structure; eager per-leaf jnp.copy would pay the ~30-50 ms
    remote-dispatch cost hundreds of times at flagship scale)."""
    import jax.numpy as jnp

    return jax.tree.map(jnp.copy, tree)


class _AsyncBestSaver:
    """Background writer for best-epoch artifacts: the device->host fetch
    and file writes (tens of seconds at flagship scale through a ~20 MB/s
    transfer path, benchmarks/ckpt_fetch_ab.py) overlap the next epochs
    instead of blocking the step loop. Latest-wins: if a newer best lands
    while one is being written, the superseded pending payload is dropped
    (its files would be overwritten immediately anyway). Errors are
    logged, never raised into the training loop."""

    def __init__(self, logger):
        import threading

        self._logger = logger
        self._cond = threading.Condition()
        self._pending = None
        self._writing = False
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="best-saver")
        self._thread.start()

    def submit(self, write_fn, label: str) -> None:
        with self._cond:
            if self._pending is not None:
                self._logger.info(
                    f"--Best-save superseded before writing ({label} "
                    f"replaces it)")
            self._pending = (write_fn, label)
            self._cond.notify_all()

    def _run(self) -> None:
        while True:
            with self._cond:
                while self._pending is None and not self._stop:
                    self._cond.wait()
                if self._pending is None and self._stop:
                    return
                write_fn, label = self._pending
                self._pending = None
                self._writing = True
            try:
                write_fn()
                self._logger.info(label)
            except Exception as e:  # never kill training from the writer
                self._logger.warning(f"--Best-save failed: {e}")
            finally:
                with self._cond:
                    self._writing = False
                    self._cond.notify_all()

    def join(self) -> None:
        """Block until every submitted save has been written."""
        with self._cond:
            while self._pending is not None or self._writing:
                self._cond.wait()

    def close(self) -> None:
        self.join()
        with self._cond:
            self._stop = True
            self._cond.notify_all()
        self._thread.join(timeout=60)


def aug_config_from(config) -> AugmentConfig:
    return AugmentConfig(
        use_elastic=config.use_elastic, use_speckle=config.use_speckle,
        use_tgc=config.use_tgc, use_clahe=config.use_clahe,
        p_crop=float(getattr(config, "p_crop", 0.0)),
        shared_geometry=bool(getattr(config, "aug_shared_geometry", False)),
        fast_warp=bool(getattr(config, "aug_fast_warp", False)),
        out_size=(config.image_size, config.image_size))


class Trainer:
    """Orchestrates train/validate/test over device-resident data sources.

    data: (train, val, test) ``DeviceDataSource``s.
    """

    def __init__(self, config, data, logger, model,
                 state: Optional[TrainState] = None, mesh=None):
        self.config = config
        self.logger = logger
        self.model = model
        self.train_src, self.val_src, self.test_src = data
        self.mesh = mesh

        # torch-numerics BN variance (QUIRKS #24): trace-time setting, must
        # flip before the step builders below trace the model. Set BOTH
        # ways so a prior Trainer's choice in the same process (library
        # use, A/B harnesses) never leaks into this one.
        from ddti_tpu.models.blocks import set_bn_fast_variance
        exact = bool(getattr(config, "bn_exact_variance", False))
        set_bn_fast_variance(not exact)
        if exact:
            logger.info("--bn_exact_variance: two-pass BatchNorm variance "
                        "(torch numerics, ~5%% slower)")

        if hasattr(self.train_src, "num_batches"):
            steps_per_epoch = max(
                self.train_src.num_batches(config.batch_size), 1)
        else:  # host-streaming source
            n = len(getattr(self.train_src, "dataset", []) or [])
            steps_per_epoch = max(-(-n // config.batch_size), 1)
        self.steps_per_epoch = steps_per_epoch
        # first epoch index train() runs; a full --resume sets this to
        # restored_step // steps_per_epoch so the run completes the
        # ORIGINAL --epochs budget instead of training that many more
        self.start_epoch = 0
        if state is None:
            shape = (1, config.image_size, config.image_size,
                     getattr(model, "in_channels", 1))
            qat = bool(getattr(config, "qat", False))
            # --qat composes with --remat since r5: the range observations
            # ride a mutable 'qobs' collection (train/qat.py:qat_apply),
            # which flax threads through nn.remat's lifted checkpoint —
            # the old side-dict tracer leak (and this guard) are gone
            from ddti_tpu.train.state import parse_freeze
            freeze = parse_freeze(config)
            state = create_train_state(
                model, jax.random.PRNGKey(config.seed), shape,
                config.lr, steps_per_epoch, config.weight_decay,
                ema=float(getattr(config, "ema_decay", 0.0) or 0.0) > 0,
                clip_norm=float(getattr(config, "clip_grad_norm", 0.0)
                                or 0.0),
                qat=qat,
                quant_min_channels=int(getattr(config,
                                               "quant_min_channels", 0)
                                       or 0),
                freeze=freeze)
            if freeze:
                from ddti_tpu.train.state import describe_freeze
                logger.info(
                    f"Freezing {','.join(freeze)}: "
                    f"{describe_freeze(state.params, freeze)} params fixed"
                    + (", BN stats pinned too"
                       if getattr(config, "freeze_bn_stats", False)
                       else " (BN stats keep adapting)"))
        self.state = state
        self._batch_sh = None
        self._multihost = mesh is not None and jax.process_count() > 1
        if mesh is not None:
            from ddti_tpu.parallel import batch_sharding, replicated
            rep = replicated(mesh)
            self.state = jax.device_put(self.state, rep)
            # spatial partitioning (H over "model") engages automatically
            # when the mesh carries a non-trivial "model" axis (--mesh
            # data=N,model=M); GSPMD emits the conv halo exchanges
            spatial = ("model" in mesh.axis_names
                       and mesh.shape["model"] > 1)
            self._batch_sh = batch_sharding(mesh, spatial=spatial)
            for src in (self.train_src, self.val_src, self.test_src):
                if not hasattr(src, "images"):
                    continue
                if self._multihost:
                    # each process keeps the store on ITS host; per-step
                    # batches are assembled from process-local rows via
                    # make_array_from_process_local_data — no cross-host
                    # data movement (replaces the single-host device_put)
                    src.images = np.asarray(src.images)
                    src.masks = np.asarray(src.masks)
                else:
                    # replicate device-resident stores so gathers stay
                    # local; the per-step batch is then resharded onto the
                    # data axis (a local slice, no collective)
                    src.images = jax.device_put(src.images, rep)
                    src.masks = jax.device_put(src.masks, rep)

        # --distill_checkpoint: a frozen teacher fused into the train step
        # (train/distill.py); its variables ride along as a step argument
        from ddti_tpu.train.distill import teacher_from_config
        t_apply, t_vars = teacher_from_config(config)
        self._teacher_vars = None
        if t_apply is not None:
            if mesh is not None:
                from ddti_tpu.parallel import replicated
                t_vars = jax.device_put(t_vars, replicated(mesh))
            self._teacher_vars = t_vars
            n_t = sum(x.size for x in jax.tree.leaves(t_vars["params"]))
            logger.info(
                f"Distilling from {config.distill_checkpoint} "
                f"({n_t / 1e6:.2f}M-param teacher, weight="
                f"{getattr(config, 'distill_weight', 0.5)}, "
                f"T={getattr(config, 'distill_temperature', 2.0)})")

        self.train_step = make_train_step(config, aug_config_from(config),
                                          teacher_apply=t_apply)
        self.host_train_step = make_host_train_step(config,
                                                    teacher_apply=t_apply)
        self.eval_step = make_eval_step(config)
        self.infer_step = make_infer_step(config)
        self.scan_epoch = (make_scan_epoch(config, aug_config_from(config),
                                           teacher_apply=t_apply)
                           if getattr(config, "fused_epoch", False) else None)

        self.early_stopping = EarlyStopping(
            logger=logger, patience=config.early_stop_patience, delta=0)
        self.writer = ScalarWriter(config.result_dir)
        # self.rng drives the non-training shuffles (test quirk #10);
        # TRAIN epochs use the stateless per-epoch streams below so a
        # --resume run reproduces the uninterrupted run's batch order and
        # augmentation randomness exactly (epoch-indexed, not a stateful
        # chain that would restart from the seed on resume)
        self.rng = np.random.default_rng(config.seed)
        self.key = jax.random.PRNGKey(config.seed)
        self.best_val_iou = -np.inf
        self._ckpt_manager = None  # lazy ManagedCheckpointer (rotation)
        self._best_saver = None    # lazy _AsyncBestSaver (async_best_save)
        self._tuned_threshold = None  # cached --tune_threshold sweep result
        # --nan_guard bookkeeping: consecutive rejected steps; training
        # stops (gracefully, checkpoints intact) once patience is exhausted
        self._nan_guard = bool(getattr(config, "nan_guard", False))
        self._nan_patience = int(getattr(config, "nan_guard_patience", 5)
                                 or 5)
        self._consecutive_skips = 0
        self._diverged = False
        # graceful preemption: SIGTERM/SIGINT during train() checkpoints
        # and stops cleanly (TPU spot/preemptible capacity sends SIGTERM;
        # the reference just dies mid-epoch with only stale saves)
        self._preempted = False

    @property
    def preempted(self) -> bool:
        """True when train() stopped on SIGTERM/SIGINT (checkpoints saved;
        resume with --resume --checkpoint_path <run>/models/<Model>_last)."""
        return self._preempted

    # ------------------------------------------------------------------

    def _log_epoch(self, phase: str, epoch: int, avgs: dict, em: dict):
        lg = self.logger
        lg.info(f"{phase} Epoch: {epoch + 1}, Avg Loss: {avgs['loss']:.4f}")
        lg.info(f"BCE Loss: {avgs['bce']:.4f}, Dice Loss: {avgs['dice']:.4f}"
                f", Focal Loss: {avgs['focal']:.4f}, Boundary Loss: "
                f"{avgs['boundary']:.4f}")
        lg.info(f"acc: {em['acc']:.4f}, precision: {em['precision']:.4f}, "
                f"recall: {em['recall']:.4f}, f1: {em['f1']:.4f}, "
                f"IoU: {em['iou']:.4f}")
        for tag, v in (("BCE Loss", avgs["bce"]), ("Dice Loss", avgs["dice"]),
                       ("Focal Loss", avgs["focal"]),
                       ("Boundary Loss", avgs["boundary"]),
                       ("Acc", em["acc"]), ("Precision", em["precision"]),
                       ("Recall", em["recall"]), ("F1", em["f1"]),
                       ("IoU", em["iou"])):
            self.writer.add_scalar(f"{tag}/{phase}", v, epoch)

    @staticmethod
    def _avgs(total) -> dict:
        n = float(total.n)
        return {k: float(getattr(total, k)) / max(n, 1.0)
                for k in ("loss", "bce", "dice", "focal", "boundary")}

    # ------------------------------------------------------------------

    @staticmethod
    def _is_device_src(src) -> bool:
        return hasattr(src, "epoch_batches")

    def _calibration_batch(self):
        """One validation batch in serving-input form (f32 [0,1] at
        image_size) — the int8 activation-scale calibration input."""
        from ddti_tpu.data.augment import eval_preprocess
        size = self.config.image_size
        for images, _masks in self._iter_batches(self.val_src,
                                                 shuffle=False):
            if images.dtype == jax.numpy.uint8:
                images = images.astype(jax.numpy.float32) / 255.0
            images, _ = eval_preprocess(images, images, (size, size))
            return images
        raise ValueError("empty validation source; cannot calibrate int8")

    def _shard_multihost(self, images, masks):
        """Multi-host feeding: every process holds the full host batch
        (identical RNG streams) but materializes only ITS rows on device;
        jax assembles the global batch-sharded array without cross-host
        copies (parallel/multihost.py:process_local_batch)."""
        from ddti_tpu.parallel import process_local_batch
        nproc = jax.process_count()
        if images.shape[0] % nproc:
            # a silent floor-divide would drop the tail rows of EVERY
            # batch with no error; demand an even split instead
            raise ValueError(
                f"batch_size {images.shape[0]} must divide evenly by the "
                f"{nproc} processes in a multi-host run")
        pid = jax.process_index()
        per = images.shape[0] // nproc
        lo = pid * per
        return process_local_batch(
            (np.asarray(images)[lo:lo + per],
             np.asarray(masks)[lo:lo + per]), self.mesh)

    def _epoch_rng(self, epoch: int) -> np.random.Generator:
        """Batch-order stream for one train epoch, derived from (seed,
        epoch) alone — resume-stable and identical in every process."""
        return np.random.default_rng((self.config.seed, epoch))

    def _epoch_key(self, epoch: int):
        """Augmentation/mixup key for one train epoch, derived from (seed,
        epoch) alone — resume-stable; fused and stepwise epochs share it
        (one fold_in per step on top keeps the two modes bit-identical)."""
        return jax.random.fold_in(self.key, epoch)

    def _iter_batches(self, src, shuffle: bool, with_idx: bool = False,
                      rng: np.random.Generator | None = None):
        """Unify device-resident and host-streaming sources: yields device
        batch arrays (uint8 store batches or host-augmented float batches —
        the jitted steps accept both; dtype is static per source).
        ``with_idx=True`` prefixes each yield with the dataset indices of
        the batch items (None for host-streaming sources, which shuffle
        internally) — used by the per-image test audit."""
        def emit(idx, batch):
            return (idx, *batch) if with_idx else batch

        if rng is None:
            rng = self.rng
        if self._is_device_src(src):
            for idx in src.epoch_batches(rng, self.config.batch_size,
                                         shuffle=shuffle):
                if self._multihost:  # host store -> process-local shards
                    yield emit(idx, self._shard_multihost(src.images[idx],
                                                          src.masks[idx]))
                    continue
                batch = gather_batch(src.images, src.masks,
                                     jax.numpy.asarray(idx))
                if self._batch_sh is not None:
                    batch = tuple(jax.device_put(x, self._batch_sh)
                                  for x in batch)
                yield emit(idx, batch)
        else:
            for images, masks in src:
                if self._multihost:
                    yield emit(None, self._shard_multihost(images, masks))
                    continue
                batch = (jax.numpy.asarray(images),
                         jax.numpy.asarray(masks))
                if self._batch_sh is not None:
                    batch = tuple(jax.device_put(x, self._batch_sh)
                                  for x in batch)
                yield emit(None, batch)

    def train_one_epoch(self, epoch: int):
        if (self.scan_epoch is not None and not self._multihost
                and self._is_device_src(self.train_src)):
            if epoch == 0 and getattr(self.config, "profile_steps", 0):
                self.logger.warning(
                    "--profile is ignored under --fused_epoch (the epoch "
                    "is ONE XLA program — there are no per-step trace "
                    "boundaries); rerun without --fused_epoch to trace")
            if epoch == 0 and self._nan_guard:
                self.logger.warning(
                    "--nan_guard under --fused_epoch degrades to EPOCH "
                    "granularity: rejected steps are still skipped inside "
                    "the scanned program, but the patience counter only "
                    "sees the per-epoch skip total (training stops when a "
                    "whole epoch is rejected, not after %s bad steps)",
                    self._nan_patience)
            return self._train_one_epoch_fused(epoch)
        total = None
        ekey = self._epoch_key(epoch)
        # tqdm-equivalent in-epoch progress (the reference wraps its loader
        # in tqdm, /root/reference/utils/trainer.py:57): every step at
        # DEBUG (file log), every log_every steps at INFO with wall-clock
        # images/sec. Loss is only read back at the INFO interval so the
        # fast path stays sync-free.
        import time as _time
        log_every = int(getattr(self.config, "log_every", 20) or 0)
        # --profile N: device trace of the first N steps of epoch 1
        # (core/profiling.py); guarded — tracing must never fail the run
        prof_n = (int(getattr(self.config, "profile_steps", 0) or 0)
                  if epoch == 0 else 0)
        prof_dir = os.path.join(self.config.result_dir, "trace")
        t0 = _time.perf_counter()
        n_imgs = 0
        if hasattr(self.train_src, "set_epoch"):  # host-streaming source:
            self.train_src.set_epoch(epoch)       # resume-stable stream
        for i, (images, masks) in enumerate(
                self._iter_batches(self.train_src, shuffle=True,
                                   rng=self._epoch_rng(epoch))):
            if prof_n and i == 0:
                try:
                    jax.profiler.start_trace(prof_dir)
                except Exception as e:
                    self.logger.warning(f"trace capture unavailable: {e}")
                    prof_n = 0
            # uint8 batches are raw store data -> full on-device
            # augmentation; float batches were augmented on the host
            # (oracle chain) -> mixup+train only
            step = (self.train_step if images.dtype == jax.numpy.uint8
                    else self.host_train_step)
            step_key = jax.random.fold_in(ekey, i)
            self.state, m = step(self.state, images, masks, step_key,
                                 self._teacher_vars)
            total = accumulate(total, m)
            n_imgs += int(images.shape[0])
            if self._nan_guard and not self._note_skip(
                    float(m.skipped), epoch, i):
                break  # patience exhausted — stop the epoch (and the run)
            if self._preempted:
                # graceful shutdown: the update that just dispatched is
                # kept; train() checkpoints the state and stops. (Under
                # --fused_epoch there is no step loop — the flag is
                # honored at the next epoch boundary instead.)
                break
            if prof_n and i + 1 == prof_n:
                try:
                    float(m.loss)  # drain the device into the trace window
                    jax.profiler.stop_trace()
                    self.logger.info(f"--Trace of {prof_n} steps written "
                                     f"to {prof_dir}")
                except Exception as e:
                    self.logger.warning(f"trace capture failed: {e}")
                prof_n = 0
            if log_every and (i + 1) % log_every == 0:
                ips = n_imgs / max(_time.perf_counter() - t0, 1e-9)
                self.logger.info(
                    f"Epoch {epoch + 1} step {i + 1}: "
                    f"loss {float(m.loss):.4f} — {ips:.1f} img/s")
            else:
                self.logger.debug(f"Epoch {epoch + 1} step {i + 1} done "
                                  f"({n_imgs} imgs)")
        if prof_n:  # epoch ended before step prof_n: close the trace
            try:
                jax.profiler.stop_trace()
                self.logger.info(f"--Trace written to {prof_dir}")
            except Exception as e:
                self.logger.warning(f"trace capture failed: {e}")
        total = jax.device_get(total)
        em = epoch_metrics_from_counts(total.counts)
        self._log_epoch("Train", epoch, self._avgs(total), em)
        self._log_skips(epoch, float(total.skipped))

    def _note_skip(self, skipped: float, epoch: int, step: int) -> bool:
        """Per-step --nan_guard accounting. Returns False when the
        consecutive-skip patience is exhausted (training should stop).
        Reading the scalar syncs on the step's completion — only paid
        with the guard on, and only the pipeline-dispatch overlap is
        lost, not device throughput."""
        if skipped > 0:
            self._consecutive_skips += 1
            self.logger.warning(
                f"--nan_guard: non-finite loss/gradients at epoch "
                f"{epoch + 1} step {step + 1} — update skipped "
                f"({self._consecutive_skips} consecutive)")
            if self._consecutive_skips >= self._nan_patience:
                self.logger.error(
                    f"--nan_guard: {self._consecutive_skips} consecutive "
                    f"non-finite steps — training has diverged; stopping "
                    f"(best/last checkpoints are intact)")
                self._diverged = True
                return False
        else:
            self._consecutive_skips = 0
        return True

    def _log_skips(self, epoch: int, skipped: float) -> None:
        if self._nan_guard:
            self.writer.add_scalar("SkippedSteps/Train", skipped, epoch)
            if skipped:
                self.logger.warning(f"--nan_guard: {int(skipped)} step(s) "
                                    f"skipped in epoch {epoch + 1}")

    def _train_one_epoch_fused(self, epoch: int):
        """One dispatch for the whole epoch: scan over precomputed batch
        index arrays (dataset resident in HBM)."""
        src = self.train_src
        idx = np.stack(list(src.epoch_batches(self._epoch_rng(epoch),
                                              self.config.batch_size)))
        idx = jax.numpy.asarray(idx)
        if self.mesh is not None:
            # shard the within-step batch axis over "data": the store is
            # replicated, so each device gathers only its batch shard
            from jax.sharding import NamedSharding, PartitionSpec as P
            idx = jax.device_put(idx, NamedSharding(self.mesh,
                                                    P(None, "data")))
        ekey = self._epoch_key(epoch)
        self.state, stacked = self.scan_epoch(
            self.state, src.images, src.masks, idx, ekey,
            self._teacher_vars)
        stacked = jax.device_get(stacked)
        # reduce the per-step stacked metrics exactly like accumulate()
        n = stacked.n.sum()
        from ddti_tpu.eval.metrics import ConfusionCounts
        counts = ConfusionCounts(*(c.sum() for c in stacked.counts))
        avgs = {k: float((getattr(stacked, k) * stacked.n).sum() / max(n, 1))
                for k in ("loss", "bce", "dice", "focal", "boundary")}
        em = epoch_metrics_from_counts(counts)
        self._log_epoch("Train", epoch, avgs, em)
        # the guard runs inside the scanned step body too; per-step
        # patience isn't observable from ONE dispatch, so the fused path
        # stops only when an entire epoch was rejected
        self._log_skips(epoch, float(stacked.skipped.sum()))
        if self._nan_guard and float(stacked.skipped.sum()) >= len(stacked.n):
            self.logger.error("--nan_guard: every step of the fused epoch "
                              "was non-finite — stopping")
            self._diverged = True

    def _first_occurrence_mask(self, idx, seen: set):
        """(B,) f32 {0,1} mask weighting out wraparound-padded duplicates
        so metrics count each image exactly once, like the reference's
        unpadded loaders (QUIRKS #22). None for host-streaming sources
        (idx is None: they already yield true ragged batches). Multi-host:
        every process computes the full mask from the (identical-RNG)
        indices and materializes only ITS rows, exactly like the batch
        itself (_shard_multihost)."""
        if idx is None:
            return None
        mask = []
        for i in np.asarray(idx):
            mask.append(0.0 if int(i) in seen else 1.0)
            seen.add(int(i))
        mask = np.asarray(mask, np.float32)
        if self._multihost:
            from ddti_tpu.parallel import process_local_batch
            per = len(mask) // jax.process_count()
            lo = jax.process_index() * per
            return process_local_batch(mask[lo:lo + per], self.mesh)
        return jax.numpy.asarray(mask)

    def validate(self, epoch: int):
        total = None
        seen = set()
        for idx, images, masks in self._iter_batches(self.val_src,
                                                     shuffle=False,
                                                     with_idx=True):
            m = self.eval_step(self.state, images, masks,
                               self._first_occurrence_mask(idx, seen))
            total = accumulate(total, m)
        total = jax.device_get(total)
        em = epoch_metrics_from_counts(total.counts)
        avgs = self._avgs(total)
        self._log_epoch("Validate", epoch, avgs, em)
        self._last_val_counts = total.counts
        return avgs["loss"], em["iou"]

    def _on_preempt_signal(self, signum, frame):
        """SIGTERM/SIGINT during train(): finish the in-flight step, then
        checkpoint and stop. A second signal aborts immediately."""
        if self._preempted:
            raise KeyboardInterrupt(f"second signal {signum}: aborting")
        self._preempted = True
        self.logger.warning(
            f"received signal {signum}: will checkpoint and stop at the "
            f"next step boundary (send again to abort without saving)")

    def _install_preempt_handlers(self):
        """Install the graceful handlers; returns the previous handlers
        (None outside the main thread, where signal.signal is illegal —
        e.g. a Trainer driven from a server worker thread)."""
        import signal as _signal
        prev = {}
        try:
            for s in (_signal.SIGTERM, _signal.SIGINT):
                prev[s] = _signal.signal(s, self._on_preempt_signal)
        except ValueError:
            return None
        return prev

    def train(self):
        cfg = self.config
        prev_handlers = self._install_preempt_handlers()
        try:
            self._train_loop(cfg)
        finally:
            if prev_handlers is not None:
                import signal as _signal
                for s, h in prev_handlers.items():
                    _signal.signal(s, h)

    def _train_loop(self, cfg):
        if self.start_epoch:
            self.logger.info(
                f"Resuming at epoch {self.start_epoch + 1}/{cfg.epochs} "
                f"(restored step {int(self.state.step)})")
        for epoch in range(self.start_epoch, cfg.epochs):
            self.train_one_epoch(epoch)
            if self._diverged:  # --nan_guard patience exhausted; the
                break           # last/best saves below still run
            if self._preempted:
                last = os.path.join(cfg.model_dir, f"{cfg.model_type}_last")
                self.logger.warning(
                    f"preempted at epoch {epoch + 1}: saving checkpoints "
                    f"and stopping — resume with --resume "
                    f"--checkpoint_path {last}")
                break
            val_loss, val_iou = self.validate(epoch)

            # periodic artifacts (makes the reference's parsed-but-unused
            # save_interval flag live): rotated async checkpoints (Orbax
            # CheckpointManager, max_to_keep newest kept) + confusion plot
            if cfg.save_interval and (epoch + 1) % cfg.save_interval == 0:
                if self._ckpt_manager is None:
                    self._ckpt_manager = ManagedCheckpointer(
                        os.path.join(cfg.model_dir, "periodic"),
                        max_to_keep=getattr(cfg, "max_keep_checkpoints", 3))
                self._ckpt_manager.save(epoch + 1, self.state,
                                        metrics={"val_iou": float(val_iou)})
                try:
                    from ddti_tpu.eval.confusion import save_confusion_matrix
                    c = self._last_val_counts
                    save_confusion_matrix(c.tp, c.fp, c.fn, c.tn,
                                          cfg.result_dir, epoch)
                except Exception:
                    pass

            if val_iou > self.best_val_iou:
                self.best_val_iou = val_iou
                self._save_best(epoch, val_iou)

            self.early_stopping(-val_iou)
            if self.early_stopping.early_stop:
                self.logger.info("--Early stopping triggered")
                break
            if self._preempted:  # signal arrived during validate/saves
                last = os.path.join(cfg.model_dir, f"{cfg.model_type}_last")
                self.logger.warning(
                    f"preempted after epoch {epoch + 1}: saving checkpoints "
                    f"and stopping — resume with --resume "
                    f"--checkpoint_path {last}")
                break

        last = os.path.join(cfg.model_dir, f"{cfg.model_type}_last")
        save_checkpoint(last, self.state)
        save_params_npz(last + ".npz", *self._eval_weights(),
                        qstats=getattr(self.state, "qstats", None))
        self._maybe_export_pth(last + ".pth")
        if self._best_saver is not None:
            # every submitted best artifact is on disk before anything
            # downstream (serving export, api.fit, the test phase's
            # callers) reads it
            self._best_saver.close()
            self._best_saver = None
        if getattr(cfg, "export_serving", False):
            if self._preempted:
                # the graceful-shutdown grace window is for checkpoints —
                # the export's 30-60 s remote compiles (plus any threshold
                # sweep) would race the scheduler's SIGKILL and keep
                # cli/main.py from reaching its exit-75/resume-hint path.
                # The resumed job exports on ITS completion.
                self.logger.warning(
                    "preempted: --export_serving skipped (runs when the "
                    "resumed job completes)")
            else:
                self._export_serving_artifacts()
        if self._ckpt_manager is not None:
            self._ckpt_manager.close()
        self.writer.close()

    def _export_serving_artifacts(self) -> None:
        """Write the serving artifacts. Each artifact is guarded
        independently (export must never fail the run), and the
        weights-as-arguments program — the only loadable form at
        flagship scale — exports FIRST so a failure in the optional
        baked-constants form cannot mask it."""
        cfg = self.config
        sd = getattr(cfg, "serving_dtype", "f32")
        wd = jax.numpy.bfloat16 if sd == "bf16" else None
        tta = bool(getattr(cfg, "tta", False))
        thr = self._serving_threshold()
        eval_params, eval_stats = self._eval_weights()
        from .checkpoint import save_variables_npz
        from .export import export_serving_program, save_serving

        ppath = os.path.join(
            cfg.model_dir, f"{cfg.model_type}_serving_program.stablehlo")
        batches = [int(b) for b in str(
            getattr(cfg, "serving_batches", "") or cfg.batch_size
        ).split(",")]
        variables_q = None
        try:
            # weights-as-arguments program (flagship-scale deployment:
            # small StableHLO program + paired .npz weight bundle; see
            # train/export.py). cli/infer.py consumes this pair directly
            # (--checkpoint <...>.stablehlo).
            if sd == "int8":
                # int8 MXU serving (train/quantize.py): BN-folded,
                # per-channel int8 weights, activation scales from one
                # calibration batch of validation images. Quantize +
                # calibrate ONCE; every batch shape and (below) the
                # sharded artifact export from the same variables.
                from .quantize import (export_quantized_program,
                                       quantize_serving)
                mc = getattr(cfg, "quant_min_channels", 0)
                qs = getattr(self.state, "qstats", None)
                if qs:
                    # --qat run: activation ranges learned as an EMA over
                    # the whole training (train/qat.py) replace the
                    # one-batch calibration
                    from .qat import qstats_amax
                    variables_q = quantize_serving(
                        self.model, eval_params, eval_stats,
                        amax=qstats_amax(qs), min_channels=mc)
                else:
                    variables_q = quantize_serving(
                        self.model, eval_params, eval_stats,
                        self._calibration_batch(), min_channels=mc)
        except Exception as e:
            self.logger.warning(f"serving quantization failed: {e}")

        written = []
        for bn in (batches if sd != "int8" or variables_q is not None
                   else []):
            # --serving_batches 1,8,128 writes one program per batch
            # shape (suffix _b<N> when several) — the multi-program
            # serving set cli/serve.py consumes as a comma list. Each
            # shape is guarded independently: one unexportable batch
            # (e.g. over the remote-compile limit) must not drop the
            # valid ones.
            out = (ppath if len(batches) == 1 else os.path.join(
                cfg.model_dir,
                f"{cfg.model_type}_b{bn}_serving_program.stablehlo"))
            try:
                if sd == "int8":
                    variables = variables_q
                    blob = export_quantized_program(
                        self.model, variables_q, batch=bn,
                        size=cfg.image_size, threshold=thr,
                        input_dtype=jax.numpy.float32, tta=tta)
                else:
                    blob, variables = export_serving_program(
                        self.model, eval_params, eval_stats,
                        batch=bn, size=cfg.image_size,
                        threshold=thr, weights_dtype=wd, tta=tta)
                with open(out, "wb") as f:
                    f.write(blob)
                save_variables_npz(out[: -len(".stablehlo")] + ".npz",
                                   variables)
                written.append(out)
            except Exception as e:
                self.logger.warning(
                    f"serving export failed at batch {bn}: {e}")
        if written:
            self.logger.info(
                "--Serving artifacts exported to " + ",".join(written))

        if self.mesh is not None and self.mesh.shape.get("data", 1) > 1:
            # the run trained on a mesh: also export a scale-out serving
            # program with GSPMD shardings baked in (weights replicated,
            # batch sharded over 'data'); int8 runs get the quantized
            # sharded graph
            try:
                if sd == "int8" and variables_q is not None:
                    from .quantize import export_quantized_program
                    sblob = export_quantized_program(
                        self.model, variables_q,
                        batch=cfg.batch_size, size=cfg.image_size,
                        threshold=thr, input_dtype=jax.numpy.float32,
                        mesh=self.mesh, tta=tta)
                    svars = variables_q
                else:
                    from .export import export_serving_sharded
                    sblob, svars = export_serving_sharded(
                        self.model, eval_params, eval_stats, self.mesh,
                        batch=cfg.batch_size, size=cfg.image_size,
                        threshold=thr, weights_dtype=wd, tta=tta)
                spath = os.path.join(
                    cfg.model_dir,
                    f"{cfg.model_type}_serving_sharded.stablehlo")
                with open(spath, "wb") as f:
                    f.write(sblob)
                save_variables_npz(
                    spath[: -len(".stablehlo")] + ".npz", svars)
                self.logger.info(f"--Sharded serving artifact: {spath}")
            except Exception as e:
                self.logger.warning(f"sharded serving export failed: {e}")

        try:
            # self-contained baked-weights artifact (small models only:
            # flagship-scale constants exceed the remote-compile request
            # limit, see export_serving_program's docstring)
            path = os.path.join(cfg.model_dir,
                                f"{cfg.model_type}_serving.stablehlo")
            save_serving(path, self.model, eval_params, eval_stats,
                         batch=cfg.batch_size,
                         size=cfg.image_size, threshold=thr, tta=tta)
            self.logger.info(f"--Baked serving artifact: {path}")
        except Exception as e:
            self.logger.warning(f"baked serving export failed: {e}")

    def _eval_weights(self) -> tuple:
        """(params, batch_stats) used for evaluation/serving: the EMA
        shadow under --ema_decay (matching what validate/test score),
        else the live params. Same selection rule as the jitted steps
        (steps._eval_variables)."""
        from .steps import _eval_variables

        use_ema = float(getattr(self.config, "ema_decay", 0.0) or 0.0) > 0
        v = _eval_variables(self.state, use_ema)
        return v["params"], v["batch_stats"]

    def _maybe_export_pth(self, path: str, weights: tuple | None = None) -> None:
        """Also export reference-format .pth weights (torch interop) so the
        torch reference can load_state_dict our training output. No-op for
        model types without a key mapping or when torch is unavailable.
        ``weights``: explicit (params, batch_stats) — the async best-saver
        passes its donation-safe snapshot; None = the live eval weights."""
        try:
            from .torch_interop import save_pth
            params, batch_stats = jax.device_get(
                self._eval_weights() if weights is None else weights)
            save_pth(path, self.config.model_type, params, batch_stats)
        except Exception as e:  # legacy models / missing torch
            self.logger.debug(f".pth export skipped: {e}")

    def _save_best(self, epoch: int, val_iou: float) -> None:
        """Write the best-epoch artifacts: .npz weights (+ .pth), plus the
        Orbax full state under --best_full_state. Default is asynchronous:
        the device->host fetch and writes (~40 s at flagship scale,
        PERF_NOTES) run on a background thread against donation-safe
        on-device snapshots while training continues; train() joins before
        anything downstream reads the files. --async_best_save false
        restores the blocking write."""
        import jax.numpy as jnp

        cfg = self.config
        best = os.path.join(cfg.model_dir, f"{cfg.model_type}_best")
        label = (f"--Best model saved at epoch {epoch + 1} "
                 f"with IoU: {val_iou:.4f}")
        qstats = getattr(self.state, "qstats", None)
        full = getattr(cfg, "best_full_state", False)
        if not getattr(cfg, "async_best_save", True):
            if full:
                # opt-in: resume-from-best with optimizer state (3x the
                # weight bytes — both AdamW moments; _last always carries
                # a resumable full state)
                save_checkpoint(best, self.state)
            save_params_npz(best + ".npz", *self._eval_weights(),
                            qstats=qstats)
            self._maybe_export_pth(best + ".pth")
            self.logger.info(label)
            return

        # donation-safe snapshots: the train step donates self.state, so
        # the NEXT step reuses its buffers — the background fetch must
        # read copies (cheap on-device; freed when the write completes).
        # One JITTED dispatch for the whole tree: eager per-leaf copies
        # would cost ~300 dispatches x 30-50 ms through the remote tunnel
        # (measured: 10-15 s per improvement epoch), the jitted copy ~none.
        weights = _snapshot(self._eval_weights())
        qsnap = _snapshot(qstats) if qstats else qstats
        state_snap = _snapshot(self.state) if full else None

        def write():
            if state_snap is not None:
                save_checkpoint(best, state_snap)
            tmp = best + ".tmp.npz"
            save_params_npz(tmp, *weights, qstats=qsnap)
            os.replace(tmp, best + ".npz")  # readers never see a torn file
            self._maybe_export_pth(best + ".pth", weights)

        if self._best_saver is None:
            self._best_saver = _AsyncBestSaver(self.logger)
        self._best_saver.submit(write, label)

    # ------------------------------------------------------------------

    def tune_threshold(self, grid=None) -> float:
        """Sweep binarization thresholds over the VAL split in one jitted
        pass per batch (all candidates scored from the same logits) and
        return the argmax-IoU operating point. Beyond-reference: the torch
        stack hardcodes 0.5 (/root/reference/utils/trainer.py:102,218)."""
        from ddti_tpu.train.steps import make_threshold_sweep_step

        grid = (np.round(np.arange(0.05, 0.951, 0.05), 2)
                if grid is None else np.asarray(grid))
        sweep = make_threshold_sweep_step(self.config, grid)
        total = None
        seen = set()
        for idx, images, masks in self._iter_batches(self.val_src,
                                                     shuffle=False,
                                                     with_idx=True):
            # the same exact per-image accounting validate() uses
            # (QUIRKS #22), so the sweep's IoU curve matches validate()'s
            c = sweep(self.state, images, masks,
                      self._first_occurrence_mask(idx, seen))
            total = c if total is None else total + c
        total = jax.device_get(total)
        ious = np.asarray(total.inter) / np.maximum(np.asarray(total.union),
                                                    1e-8)
        best = int(np.argmax(ious))
        t = float(grid[best])
        self.logger.info(
            "Threshold sweep (val IoU): "
            + ", ".join(f"{g:.2f}:{i:.4f}" for g, i in zip(grid, ious))
            + f" -> using {t:.2f}")
        self._tuned_threshold = t
        return t

    def _serving_threshold(self) -> float:
        """Binarization threshold baked into serving exports: the
        val-tuned operating point under --tune_threshold (cached — test()
        reuses the same sweep), else the reference's hardcoded 0.5. The
        export path must never fail the run, so a sweep error (e.g. empty
        val split) falls back to 0.5."""
        if not getattr(self.config, "tune_threshold", False):
            return 0.5
        if self._tuned_threshold is None:
            try:
                self.tune_threshold()
            except Exception as e:
                self.logger.warning(
                    f"threshold sweep failed ({e}); exporting at 0.5")
                return 0.5
        return self._tuned_threshold

    def test(self, visualize: bool = True):
        """Global micro-averaged pixel metrics over the test split plus the
        contour-overlay grids (trainer.py:206-299). The test loader keeps the
        reference's shuffle=True quirk via the rng permutation."""
        self.logger.info(
            "------------------Starting Testing Model------------------")
        threshold = 0.5
        if getattr(self.config, "tune_threshold", False):
            # reuse the sweep the serving export already ran (same final
            # weights, same val split) — tune once per trained model
            threshold = (self._tuned_threshold
                         if self._tuned_threshold is not None
                         else self.tune_threshold())
            if threshold != 0.5:
                from ddti_tpu.train.steps import make_infer_step
                self.infer_step = make_infer_step(self.config, threshold)
        if visualize and self._multihost and jax.process_count() > 1:
            # per-batch outputs are globally sharded across hosts;
            # np.asarray on a non-addressable array raises. Metrics (device
            # psum) still work — only the host-side grids are skipped.
            self.logger.info("visualization skipped in multi-host runs "
                             "(outputs span non-addressable devices)")
            visualize = False
        all_imgs, all_masks, all_preds = [], [], []
        counts_total = None
        audit = self._multihost and jax.process_count() > 1
        rows, seen = [], set()  # per-image audit rows (skipped multi-host)
        surf_fn = None
        if getattr(self.config, "surface_metrics", True) and not audit:
            # contour-quality metrics (HD95/ASSD) the reference's
            # pixel-overlap report lacks; on-device EDT per image
            from ddti_tpu.eval.surface import surface_metrics_batch
            surf_fn = surface_metrics_batch
        for idx, images, masks in self._iter_batches(self.test_src,
                                                     shuffle=True,
                                                     with_idx=True):
            imgs_f, masks_f, preds, counts, per_img = self.infer_step(
                self.state, images, masks)
            if audit:
                # multi-host: the host-side audit rows can't be collected
                # (per_img spans non-addressable devices), but the padded
                # duplicates still weight out ON DEVICE so the global
                # metrics count each image exactly once (QUIRKS #22)
                valid = self._first_occurrence_mask(idx, seen)
                if valid is not None:
                    from ddti_tpu.eval.metrics import ConfusionCounts
                    counts = ConfusionCounts(
                        *((v * valid).sum() for v in per_img))
            counts_total = (counts if counts_total is None
                            else counts_total + counts)
            if not audit:
                surf = (jax.device_get(surf_fn(preds, masks_f))
                        if surf_fn is not None else None)
                self._collect_per_image(rows, seen, idx, per_img, surf)
            if visualize:
                all_imgs.append(np.asarray(imgs_f)[..., 0])
                all_masks.append(np.asarray(masks_f)[..., 0].astype(np.uint8))
                all_preds.append(np.asarray(preds)[..., 0])

        if rows:
            # non-divisible test sets get their last batch wraparound-
            # padded (static shapes); the reference iterates each image
            # exactly once (drop_last=False, no padding), so the global
            # metrics come from the DEDUPED per-image rows — identical to
            # the device totals whenever batch_size divides the set
            m = metrics_from_counts(
                sum(r["tp"] for r in rows), sum(r["fp"] for r in rows),
                sum(r["fn"] for r in rows), sum(r["tn"] for r in rows))
            total = len(rows)
        else:  # multi-host path: device totals (padded duplicates already
            # weighted out above, so these are exact too)
            counts_total = jax.device_get(counts_total)
            m = metrics_from_counts(counts_total.tp, counts_total.fp,
                                    counts_total.fn, counts_total.tn)
            total = int(m["tp"] + m["fp"] + m["fn"] + m["tn"]) // (
                self.config.image_size ** 2)
        if rows and "hd95" in rows[0]:
            import math
            sd = [(r["hd95"], r["assd"]) for r in rows
                  if not math.isnan(r["hd95"])]
            if sd:
                m["hd95_mean"] = float(np.mean([x[0] for x in sd]))
                m["hd95_median"] = float(np.median([x[0] for x in sd]))
                m["assd_mean"] = float(np.mean([x[1] for x in sd]))
                m["surface_valid_images"] = float(len(sd))
        msg = (f"Test Metrics  —  Total Images: {total}\n"
               f"  TP={int(m['tp'])}, FP={int(m['fp'])}, "
               f"FN={int(m['fn'])}, TN={int(m['tn'])}\n"
               f"  ACC={m['acc']:.4f}, Precision={m['precision']:.4f}, "
               f"Recall={m['recall']:.4f}, F1={m['f1']:.4f}, "
               f"IoU={m['iou']:.4f}")
        if "hd95_mean" in m:
            msg += (f"\n  Surface (px, over "
                    f"{int(m['surface_valid_images'])} defined images): "
                    f"HD95 mean={m['hd95_mean']:.2f} "
                    f"median={m['hd95_median']:.2f}, "
                    f"ASSD mean={m['assd_mean']:.2f}")
        print(msg)
        self.logger.info(msg)

        # machine-readable twin of the log block — the sweep aggregator
        # (cli/aggregate.py) reads this instead of scraping logs
        try:
            import json
            with open(os.path.join(self.config.result_dir,
                                   "test_metrics.json"), "w") as f:
                json.dump({**{k: float(v) for k, v in m.items()},
                           "total_images": total,
                           "model_type": self.config.model_type,
                           "threshold": threshold,
                           "tta": bool(getattr(self.config, "tta", False))},
                          f, indent=1)
        except OSError as e:  # metrics were already logged; don't fail test()
            self.logger.warning(f"test_metrics.json write failed: {e}")

        if rows:
            self._write_per_image_csv(rows)

        if visualize and all_imgs:
            save_boundary_grids(np.concatenate(all_imgs),
                                np.concatenate(all_masks),
                                np.concatenate(all_preds),
                                self.config.result_dir)
        return m

    def _collect_per_image(self, rows: list, seen: set, idx, per_img,
                           surf=None):
        """Accumulate per-image audit rows from one test batch. ``idx`` is
        the dataset index array (None for host-streaming sources — rows
        then carry a running position only). Wraparound-padded duplicates
        in the final short batch are dropped via ``seen``. ``surf`` is the
        optional per-image surface-distance dict from
        ``eval.surface.surface_metrics_batch``."""
        c = jax.device_get(per_img)
        n = len(c.tp)
        ids = (np.asarray(idx) if idx is not None
               else np.arange(len(rows), len(rows) + n))
        names = getattr(self.test_src, "names", None)
        for j in range(n):
            i = int(ids[j])
            if idx is not None:
                if i in seen:
                    continue
                seen.add(i)
            tp, fp, fn = float(c.tp[j]), float(c.fp[j]), float(c.fn[j])
            inter, union = float(c.inter[j]), float(c.union[j])
            row = {
                "index": i,
                "name": (names[i] if names is not None and idx is not None
                         else ""),
                # per-image IoU under the reference's bool convention
                # (utils.py:225-231); empty target+pred -> nan
                "iou": inter / union if union > 0 else float("nan"),
                # soft-dice-free pixel Dice from the int-convention counts
                "dice": (2 * tp / (2 * tp + fp + fn)
                         if (2 * tp + fp + fn) > 0 else float("nan")),
                "tp": int(tp), "fp": int(fp), "fn": int(fn),
                "tn": int(c.tn[j]),
            }
            if surf is not None:
                # NaN when either surface is empty (metric undefined)
                row["hd95"] = float(surf["hd95"][j])
                row["assd"] = float(surf["assd"][j])
            rows.append(row)

    def _write_per_image_csv(self, rows: list) -> None:
        """``result/per_image_metrics.csv`` — one audit row per test image
        (worst cases first), plus a summary log line. Beyond-reference:
        the torch reference only reports the micro-average over all
        pixels, which hides failing images entirely."""
        import csv
        import math

        rows = sorted(rows, key=lambda r: (math.isnan(r["iou"]),
                                           r["iou"]))
        path = os.path.join(self.config.result_dir,
                            "per_image_metrics.csv")
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        ious = [r["iou"] for r in rows if not math.isnan(r["iou"])]
        if ious:
            med = float(np.median(ious))
            worst = ", ".join(
                f"{r['name'] or r['index']}={r['iou']:.3f}"
                for r in rows[:3] if not math.isnan(r["iou"]))
            self.logger.info(
                f"Per-image IoU: median {med:.4f}, min {min(ious):.4f} "
                f"(worst: {worst}) — {path}")

"""Checkpointing: Orbax full-train-state save/restore + best/last policy.

The reference saves only raw ``state_dict`` weights at best-IoU and at the
end (/root/reference/utils/trainer.py:184-202) and warm-starts from a path
(/root/reference/main.py:141-142) — optimizer/step state is lost on resume.
Here the Orbax checkpoint carries params, BatchNorm stats, optimizer state
and step, so resume continues the schedule exactly; ``.pth`` interop lives
in ``ddti_tpu.train.torch_interop``.
"""

from __future__ import annotations

import os
import threading
from typing import Any

import jax
import numpy as np

# Orbax saves can run concurrently here (the async best-saver thread vs the
# main thread's end-of-train "_last" save, train/engine.py) and orbax's
# shared async commit machinery is not safe under that overlap: observed
# spurious ``[Errno 17] File exists: <path>.orbax-checkpoint-tmp`` losing a
# best-epoch artifact. One process-wide lock serializes the orbax write
# paths (save_checkpoint, ManagedCheckpointer.save enqueue + wait); the
# device->host fetch still overlaps training. Residual window (documented,
# accepted): an async CheckpointManager commit that is already in flight
# between save() returning and wait() can still overlap a concurrent
# save_checkpoint — the manager writes under its own step-indexed
# directory (never save_checkpoint's `<path>.orbax-checkpoint-tmp`), so
# the observed EEXIST collision cannot recur there; full serialization
# would force every periodic save synchronous.
_ORBAX_SAVE_LOCK = threading.Lock()


def _tree_dict(state) -> dict:
    d = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    # only present under --ema_decay; omitted otherwise so checkpoints
    # stay interchangeable with pre-EMA runs
    if getattr(state, "ema_params", None) is not None:
        d["ema_params"] = state.ema_params
    # only present under --qat (the activation-range EMA, train/qat.py)
    if getattr(state, "qstats", None):
        d["qstats"] = state.qstats
    return d


def save_checkpoint(path: str, state) -> None:
    """Save the train state to ``path`` (a directory) with Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    host_state = _tree_dict(jax.device_get(state))
    with _ORBAX_SAVE_LOCK:
        # a stale tmp dir (e.g. from a save interrupted by preemption)
        # would fail every later save of this path with EEXIST —
        # force=True only clears the FINAL directory. Glob rather than the
        # one exact name: orbax 0.11 writes `<path>.orbax-checkpoint-tmp`
        # but other orbax code paths/versions suffix a timestamp
        # (`...-tmp-<ts>`), and a naming drift would silently defeat both
        # the cleanup and the EEXIST premise (ADVICE r4).
        import glob
        import shutil

        for tmp in glob.glob(glob.escape(path) + ".orbax-checkpoint-tmp*"):
            if os.path.isdir(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, host_state, force=True)
        ckptr.wait_until_finished()


def _ckpt_tree_meta(path: str):
    """The saved checkpoint's tree metadata (None if the installed Orbax
    can't report it) — used to reconcile the optional top-level keys
    (ema_params, qstats), which are present only for --ema_decay / --qat
    runs, against the caller's template (Orbax's structure check has no
    partial restore)."""
    try:
        import orbax.checkpoint as ocp

        md = ocp.StandardCheckpointer().metadata(path)
        return md.item_metadata.tree if hasattr(md, "item_metadata") else md
    except Exception:
        return None


def _align_optional_target(target: dict, tree) -> dict:
    """Make the restore template's optional-key presence (ema_params,
    qstats) match the checkpoint's — Orbax's structure check has no
    partial restore, so presence must agree in both directions. The EMA
    shadow has the params' shapes (params serve as its template); a
    qstats template is rebuilt from the checkpoint's own metadata keys
    (f32 scalars by construction, train/qat.py)."""
    if tree is None:
        return target
    keys = set(tree.keys())
    if "ema_params" in keys and "ema_params" not in target:
        target = dict(target, ema_params=target["params"])
    if "ema_params" not in keys and "ema_params" in target:
        target = {k: v for k, v in target.items() if k != "ema_params"}
    if "qstats" not in keys and "qstats" in target:
        target = {k: v for k, v in target.items() if k != "qstats"}
    if "qstats" in keys:
        # rebuild the qstats template from the CHECKPOINT's own keys —
        # even when the caller tracks qstats too, its key set may differ
        # (a changed --quant_min_channels); _merge_restored_qstats then
        # maps the restored values back onto the run's own keys
        try:
            qkeys = list(tree["qstats"].keys())
            target = dict(target, qstats={
                k: np.zeros((), np.float32) for k in qkeys})
        except Exception:
            pass  # unreadable metadata: let the restore raise naturally
    return target


def _merge_restored_ema(state, restored: dict):
    """The ema_params to carry forward: the saved shadow when the run
    wants one; a pre-EMA checkpoint seeds the shadow from the restored
    weights; with EMA off any saved shadow is dropped."""
    if state.ema_params is None:
        return None
    ema = restored.get("ema_params")
    if ema is None:
        ema = jax.tree.map(lambda p: p, restored["params"])
    return ema


def _merge_restored_qstats(state, restored: dict):
    """The QAT activation ranges to carry forward: restored values for the
    paths this run tracks (per-key — a changed --quant_min_channels keeps
    the overlap), zeros init for new paths; with --qat off any saved
    ranges are dropped."""
    if getattr(state, "qstats", None) is None:
        return None
    saved = restored.get("qstats") or {}
    return {p: saved.get(p, v) for p, v in state.qstats.items()}


def restore_checkpoint(path: str, state):
    """Restore into the structure of ``state`` (returns a new TrainState).
    Checkpoints with/without an EMA shadow restore into states
    with/without one in any combination (see _merge_restored_ema)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = _align_optional_target(jax.device_get(_tree_dict(state)),
                                    _ckpt_tree_meta(path))
    restored = ckptr.restore(path, target)
    return state.replace(step=restored["step"], params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         ema_params=_merge_restored_ema(state, restored),
                         qstats=_merge_restored_qstats(state, restored))


class ManagedCheckpointer:
    """Orbax ``CheckpointManager`` wrapper for long runs: step-indexed
    checkpoint rotation (``max_to_keep``), asynchronous saves (training
    continues while the previous checkpoint writes), per-step metrics, and
    restore-latest for crash recovery.

    The reference's save policy is best+last only
    (/root/reference/utils/trainer.py:184-202) with no rotation and no
    recovery from a mid-run crash; this supplies the production-grade path
    (Trainer uses it for the ``save_interval`` periodic checkpoints).
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 async_save: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
                create=True,
            ),
        )

    def save(self, step: int, state, metrics: dict | None = None) -> bool:
        """Queue a save of the full train state at ``step``. Returns whether
        a save was performed (False if the manager's policy skipped it).

        Takes the process-wide orbax lock: the async CheckpointManager
        drives the same shared orbax async-commit machinery as
        ``save_checkpoint`` (used concurrently by the best-saver thread),
        and that overlap corrupted a save once (see _ORBAX_SAVE_LOCK).
        The device->host fetch runs BEFORE the lock; only the enqueue is
        serialized, and the async write still overlaps training. Known
        tradeoff: if the best-saver currently holds the lock for a full
        synchronous save (~40 s at flagship scale under
        --best_full_state), this enqueue — and the training thread — wait
        behind it."""
        host_state = _tree_dict(jax.device_get(state))
        with _ORBAX_SAVE_LOCK:
            return self.manager.save(
                int(step), args=self._ocp.args.StandardSave(host_state),
                metrics=metrics)

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore_latest(self, state):
        """Restore the newest checkpoint into ``state``'s structure.
        Returns ``(new_state, step)``, or ``None`` if nothing is saved."""
        step = self.manager.latest_step()
        if step is None:
            return None
        target = jax.device_get(_tree_dict(state))
        try:
            restored = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(target))
        except ValueError:
            # optional-key presence (ema_params/qstats) differs between
            # this run's flags and the saved checkpoint; rebuild the
            # template from the checkpoint's own metadata
            tree = None
            try:
                md = self.manager.item_metadata(step)
                tree = md.tree if hasattr(md, "tree") else md
            except Exception:
                pass
            if tree is not None:
                target = _align_optional_target(target, tree)
            else:  # metadata unavailable: fall back to the EMA toggle
                target = (dict(target, ema_params=target["params"])
                          if "ema_params" not in target else
                          {k: v for k, v in target.items()
                           if k != "ema_params"})
            restored = self.manager.restore(
                step, args=self._ocp.args.StandardRestore(target))
        return state.replace(
            step=restored["step"], params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            ema_params=_merge_restored_ema(state, restored),
            qstats=_merge_restored_qstats(state, restored)), step

    def wait(self) -> None:
        with _ORBAX_SAVE_LOCK:
            self.manager.wait_until_finished()

    def close(self) -> None:
        with _ORBAX_SAVE_LOCK:
            self.manager.wait_until_finished()
            self.manager.close()


def load_checkpoint_into(path: str, model_type: str, params: Any,
                         batch_stats: Any, prefer_ema: bool = True):
    """Load any supported checkpoint form into (params, batch_stats)
    matching the given templates: reference-format ``.pth``, ``.npz``
    weight export, or an Orbax checkpoint directory.

    ``prefer_ema`` (serving/inference default): an --ema_decay run's EMA
    shadow is returned instead of the live params — the weights the run's
    logged metrics describe. Pass False for training warm starts, which
    continue from the live weights. This path never touches the saved
    opt_state structure, so warm-starting across optimizer changes
    (--freeze, --clip_grad_norm) works."""
    import os

    import jax.numpy as jnp

    if path.endswith(".pth"):
        from ddti_tpu.train.torch_interop import import_state_dict, load_pth
        return import_state_dict(model_type, load_pth(path), params,
                                 batch_stats)
    if path.endswith(".npz"):
        return load_params_npz(path, params, batch_stats)
    import orbax.checkpoint as ocp

    # restore as-saved (no template): full-state checkpoints carry
    # step/opt_state too, and a template with opt_state=None trips Orbax's
    # structure check (this Orbax has no partial_restore); inference only
    # needs params/batch_stats, cast into the callers' template dtypes
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))

    def cast_like(tmpl, got):
        return jax.tree.map(
            lambda t, g: jnp.asarray(g, getattr(t, "dtype", None)),
            tmpl, got)

    weights = restored.get("ema_params") if prefer_ema else None
    if weights is None:
        weights = restored["params"]
    return (cast_like(params, weights),
            cast_like(batch_stats, restored["batch_stats"]))


def save_variables_npz(path: str, variables: dict) -> None:
    """Flat .npz export of a flax variables dict (any collections — params,
    batch_stats, quantization tables, ...) — the analogue of the
    reference's bare ``state_dict`` .pth files."""
    import numpy as np

    flat = {}
    for prefix, tree in variables.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in leaves:
            key = prefix + "".join(
                f"/{getattr(k, 'key', getattr(k, 'idx', k))}" for k in kp)
            arr = np.asarray(leaf)
            if arr.dtype == jax.numpy.bfloat16:
                # numpy's npz format can't round-trip ml_dtypes.bfloat16
                # (loads as void); store the raw bits with a key marker
                key += "::bf16"
                arr = arr.view(np.uint16)
            flat[key] = arr
    np.savez(path, **flat)


def load_variables_npz(path: str, template: dict) -> dict:
    """Load a ``save_variables_npz`` export back into pytrees matching the
    ``template`` variables dict (leaves only supply shape/dtype)."""
    import numpy as np

    data = np.load(path)

    def rebuild(prefix, tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new = []
        for kp, leaf in leaves:
            key = prefix + "".join(
                f"/{getattr(k, 'key', getattr(k, 'idx', k))}" for k in kp)
            if key in data.files:
                arr = data[key]
            else:  # bf16 leaves are stored as raw uint16 bits
                arr = data[key + "::bf16"].view(jax.numpy.bfloat16)
            if arr.shape != leaf.shape:
                raise ValueError(f"shape mismatch for {key}: "
                                 f"{arr.shape} vs {leaf.shape}")
            new.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, new)

    return {prefix: rebuild(prefix, tree)
            for prefix, tree in template.items()}


def save_params_npz(path: str, params: Any, batch_stats: Any,
                    qstats: Any = None) -> None:
    """Two-collection convenience wrapper over ``save_variables_npz``
    (plus the QAT activation ranges when the run tracked them — readers
    that only want weights ignore the extra entries)."""
    v = {"params": params, "batch_stats": batch_stats}
    if qstats:
        v["qstats"] = qstats
    save_variables_npz(path, v)


def load_params_npz(path: str, params: Any, batch_stats: Any):
    """Two-collection convenience wrapper over ``load_variables_npz``."""
    out = load_variables_npz(path, {"params": params,
                                    "batch_stats": batch_stats})
    return out["params"], out["batch_stats"]


def load_qstats(path: str) -> dict | None:
    """QAT activation ranges carried by a checkpoint, if any: Orbax
    full-state dirs (``qstats`` key) and ``.npz`` weight exports
    (``qstats/<path>`` entries). Returns ``{"module/path": float}`` or
    None (reference ``.pth`` files never carry ranges). Offline int8
    export (cli/quantize) prefers these over one-batch calibration."""
    if path.endswith(".npz"):
        data = np.load(path)
        out = {k.split("/", 1)[1]: float(data[k]) for k in data.files
               if k.startswith("qstats/")}
        return out or None
    if not os.path.isdir(path):
        return None
    tree = _ckpt_tree_meta(os.path.abspath(path))
    if tree is None or "qstats" not in set(tree.keys()):
        return None
    import orbax.checkpoint as ocp

    apath = os.path.abspath(path)
    try:
        # partial restore: read ONLY the scalar range tree — a flagship
        # full-state restore would materialize params + both AdamW
        # moments (>1.5 GB) to extract ~50 floats
        target = {"qstats": {k: np.zeros((), np.float32)
                             for k in tree["qstats"].keys()}}
        restored = ocp.PyTreeCheckpointer().restore(
            apath, args=ocp.args.PyTreeRestore(item=target,
                                               partial_restore=True))
    except Exception:  # older orbax: fall back to the full restore
        restored = ocp.StandardCheckpointer().restore(apath)
    q = restored.get("qstats") or {}
    out = {p: float(v) for p, v in q.items()}
    return out or None

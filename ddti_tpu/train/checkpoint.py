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
from typing import Any

import jax


def _tree_dict(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def save_checkpoint(path: str, state) -> None:
    """Save the train state to ``path`` (a directory) with Orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _tree_dict(jax.device_get(state)), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, state):
    """Restore into the structure of ``state`` (returns a new TrainState)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.device_get(_tree_dict(state))
    restored = ckptr.restore(path, target)
    return state.replace(step=restored["step"], params=restored["params"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"])


def save_params_npz(path: str, params: Any, batch_stats: Any) -> None:
    """Light-weight flat .npz export of weights (+BN stats) — the analogue
    of the reference's bare ``state_dict`` .pth files."""
    import numpy as np

    flat = {}
    for prefix, tree in (("params", params), ("batch_stats", batch_stats)):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in leaves:
            key = prefix + "".join(
                f"/{getattr(k, 'key', getattr(k, 'idx', k))}" for k in kp)
            flat[key] = np.asarray(leaf)
    np.savez(path, **flat)


def load_params_npz(path: str, params: Any, batch_stats: Any):
    """Load an .npz export back into matching pytrees."""
    import numpy as np

    data = np.load(path)

    def rebuild(prefix, tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        new = []
        for kp, leaf in leaves:
            key = prefix + "".join(
                f"/{getattr(k, 'key', getattr(k, 'idx', k))}" for k in kp)
            arr = data[key]
            if arr.shape != leaf.shape:
                raise ValueError(f"shape mismatch for {key}: "
                                 f"{arr.shape} vs {leaf.shape}")
            new.append(arr.astype(leaf.dtype))
        return jax.tree_util.tree_unflatten(treedef, new)

    return rebuild("params", params), rebuild("batch_stats", batch_stats)

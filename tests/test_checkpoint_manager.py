"""ManagedCheckpointer (Orbax CheckpointManager wrapper): rotation keeps
only the newest max_to_keep step dirs, restore_latest round-trips the full
train state, and a Trainer run with save_interval produces a rotated
periodic checkpoint tree that a fresh Trainer can resume from."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.models import create_model
from ddti_tpu.train import create_train_state
from ddti_tpu.train.checkpoint import ManagedCheckpointer
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def _state(seed=0, lr=1e-3):
    model = create_model("UNet", base_filters=8, depth=3)
    return create_train_state(model, jax.random.PRNGKey(seed),
                              (1, 32, 32, 1), lr, steps_per_epoch=10)


def test_rotation_keeps_newest(tmp_path):
    mgr = ManagedCheckpointer(str(tmp_path / "ck"), max_to_keep=2,
                              async_save=False)
    state = _state()
    for step in (1, 2, 3, 4, 5):
        assert mgr.save(step, state.replace(step=jnp.asarray(step)),
                        metrics={"val_iou": step / 10})
    mgr.wait()
    kept = sorted(int(d) for d in os.listdir(tmp_path / "ck")
                  if d.isdigit())
    assert kept == [4, 5]
    assert mgr.latest_step() == 5
    mgr.close()


def test_restore_latest_roundtrip(tmp_path):
    mgr = ManagedCheckpointer(str(tmp_path / "ck"), max_to_keep=3,
                              async_save=False)
    state = _state(seed=1)
    mgr.save(7, state.replace(step=jnp.asarray(7)))
    mgr.wait()

    fresh = _state(seed=99)  # different init — must be overwritten
    restored, step = mgr.restore_latest(fresh)
    assert step == 7 and int(restored.step) == 7
    want = jax.tree_util.tree_leaves(state.params)
    got = jax.tree_util.tree_leaves(restored.params)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    mgr.close()


def test_restore_latest_empty(tmp_path):
    mgr = ManagedCheckpointer(str(tmp_path / "ck"), async_save=False)
    assert mgr.restore_latest(_state()) is None
    mgr.close()


def test_trainer_periodic_rotation_and_resume(tmp_path):
    """End-to-end: Trainer writes rotated periodic checkpoints under
    model_dir/periodic, and the CLI-style managed-dir resume restores the
    newest step into a fresh state."""
    from ddti_tpu.core import Config, create_logger
    from ddti_tpu.data import DeviceDataSource, generate_ddti_like
    from ddti_tpu.train import Trainer

    cfg = Config(epochs=3, batch_size=4, image_size=32, store_size=32,
                 lr=3e-3, model_type="UNet", base_dir=str(tmp_path),
                 save_interval=1, max_keep_checkpoints=2,
                 early_stop_patience=50)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "t.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
                 for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()

    pdir = os.path.join(cfg.model_dir, "periodic")
    kept = sorted(int(d) for d in os.listdir(pdir) if d.isdigit())
    assert kept == [2, 3]  # 3 epochs saved at interval 1, rotation depth 2

    mgr = ManagedCheckpointer(pdir)
    restored, step = mgr.restore_latest(_state(seed=5))
    assert step == 3
    mgr.close()

"""EMA (exponential moving average) weights — --ema_decay.

Beyond-reference training feature: a decay-weighted shadow of the params
updated inside the jitted step; validation/test/serving score the shadow.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ddti_tpu.core import Config  # noqa: E402
from ddti_tpu.data import generate_ddti_like  # noqa: E402
from ddti_tpu.models import create_model  # noqa: E402
from ddti_tpu.train import create_train_state, make_train_step  # noqa: E402
from ddti_tpu.train.engine import aug_config_from  # noqa: E402
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"

DECAY = 0.5  # large blend so drift is visible within a few steps


def _cfg(**kw):
    base = dict(batch_size=4, image_size=32, store_size=32, lr=1e-3,
                model_type="UNet", ema_decay=DECAY, use_mixup=False,
                compute_unused_losses=False)
    base.update(kw)
    return Config(**base)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(jax.device_get(tree))]


def test_ema_matches_manual_recursion():
    cfg = _cfg()
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=4, ema=True)
    # ema initializes to the params
    for e, p in zip(_leaves(state.ema_params), _leaves(state.params)):
        np.testing.assert_array_equal(e, p)

    im, ma = generate_ddti_like(4, (32, 32), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    step = make_train_step(cfg, aug_config_from(cfg))

    manual = _leaves(state.params)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        state, _ = step(state, im, ma, k)
        params = _leaves(state.params)
        manual = [e * DECAY + p * (1 - DECAY)
                  for e, p in zip(manual, params)]
    got = _leaves(state.ema_params)
    for g, w, p in zip(got, manual, _leaves(state.params)):
        np.testing.assert_allclose(g, w, atol=1e-6)
    # and the shadow genuinely lags the live params
    assert any(np.abs(g - p).max() > 1e-7
               for g, p in zip(got, _leaves(state.params)))


def test_eval_and_infer_use_the_ema_shadow():
    from ddti_tpu.train import make_infer_step

    cfg = _cfg()
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=4, ema=True)
    # plant a distinct shadow: zeroed conv kernels -> constant logits
    zeros = jax.tree.map(jnp.zeros_like, state.params)
    state = state.replace(ema_params=zeros)
    im, ma = generate_ddti_like(4, (32, 32), 1)
    im, ma = jnp.asarray(im), jnp.asarray(ma)

    _, _, preds, _, _ = make_infer_step(cfg)(state, im, ma)
    want = model.apply({"params": zeros,
                        "batch_stats": state.batch_stats},
                       im.astype(jnp.float32) / 255.0, train=False)
    want = (jax.nn.sigmoid(np.asarray(want, np.float32)) > 0.5)
    np.testing.assert_array_equal(np.asarray(preds).astype(bool), want)

    # without ema_decay the same state scores the live params
    _, _, preds_live, _, _ = make_infer_step(_cfg(ema_decay=0.0))(
        state, im, ma)
    live = model.apply({"params": state.params,
                        "batch_stats": state.batch_stats},
                       im.astype(jnp.float32) / 255.0, train=False)
    live = (jax.nn.sigmoid(np.asarray(live, np.float32)) > 0.5)
    np.testing.assert_array_equal(np.asarray(preds_live).astype(bool), live)


def test_checkpoint_roundtrips_ema(tmp_path):
    from ddti_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               1e-3, steps_per_epoch=4, ema=True)
    planted = jax.tree.map(lambda p: p + 1.0, state.params)
    state = state.replace(ema_params=planted)
    path = str(tmp_path / "ck")
    save_checkpoint(path, state)

    fresh = create_train_state(model, jax.random.PRNGKey(2), (1, 32, 32, 1),
                               1e-3, steps_per_epoch=4, ema=True)
    restored = restore_checkpoint(path, fresh)
    for a, b in zip(_leaves(restored.ema_params), _leaves(planted)):
        np.testing.assert_array_equal(a, b)

    # ema-less states keep the old checkpoint layout (no ema key)
    plain = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               1e-3, steps_per_epoch=4)
    p2 = str(tmp_path / "ck2")
    save_checkpoint(p2, plain)
    r2 = restore_checkpoint(p2, create_train_state(
        model, jax.random.PRNGKey(3), (1, 32, 32, 1), 1e-3,
        steps_per_epoch=4))
    assert r2.ema_params is None


def test_trainer_ema_end_to_end(tmp_path):
    from ddti_tpu.core import create_logger
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.train.engine import Trainer

    cfg = _cfg(epochs=1, base_dir=str(tmp_path), use_data_parallel=False,
               ema_decay=0.9)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(4, (32, 32), s))
                 for s in (0, 1, 2))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()
    assert tr.state.ema_params is not None
    m = tr.test(visualize=False)
    assert 0.0 <= m["acc"] <= 1.0
    # the exported .npz carries the EMA (eval) weights, not the live ones
    from ddti_tpu.train.checkpoint import load_params_npz
    loaded, _ = load_params_npz(os.path.join(cfg.model_dir, "UNet_last.npz"),
                                tr.state.params, tr.state.batch_stats)
    same_as_ema = jax.tree.map(
        lambda a, b: bool(np.allclose(a, b, atol=1e-7)),
        jax.device_get(loaded), jax.device_get(tr.state.ema_params))
    assert all(jax.tree.leaves(same_as_ema))
    same_as_live = jax.tree.map(
        lambda a, b: bool(np.allclose(a, b, atol=1e-9)),
        jax.device_get(loaded), jax.device_get(tr.state.params))
    assert not all(jax.tree.leaves(same_as_live))


def test_checkpoint_ema_flag_toggles(tmp_path):
    """Restores work in every save/restore EMA-flag combination."""
    from ddti_tpu.train.checkpoint import (
        load_checkpoint_into,
        restore_checkpoint,
        save_checkpoint,
    )

    model = create_model("UNet", base_filters=8, depth=3)

    def fresh(seed, ema):
        return create_train_state(model, jax.random.PRNGKey(seed),
                                  (1, 32, 32, 1), 1e-3, steps_per_epoch=4,
                                  ema=ema)

    # pre-EMA checkpoint -> EMA run: shadow seeds from restored weights
    plain = fresh(0, ema=False)
    p1 = str(tmp_path / "plain_ck")
    save_checkpoint(p1, plain)
    r = restore_checkpoint(p1, fresh(1, ema=True))
    for e, p in zip(_leaves(r.ema_params), _leaves(plain.params)):
        np.testing.assert_array_equal(e, p)

    # EMA checkpoint -> plain run: shadow dropped, params restored
    emast = fresh(2, ema=True).replace(
        ema_params=jax.tree.map(lambda p: p + 1.0, fresh(2, True).params))
    p2 = str(tmp_path / "ema_ck")
    save_checkpoint(p2, emast)
    r2 = restore_checkpoint(p2, fresh(3, ema=False))
    assert r2.ema_params is None
    for a, b in zip(_leaves(r2.params), _leaves(emast.params)):
        np.testing.assert_array_equal(a, b)

    # inference loader prefers the saved shadow (what the run validated)
    lp, _ = load_checkpoint_into(p2, "UNet", emast.params,
                                 emast.batch_stats)
    for a, b in zip(_leaves(lp), _leaves(emast.ema_params)):
        np.testing.assert_array_equal(a, b)


def test_managed_checkpointer_restores_ema(tmp_path):
    """Crash-recovery path (--resume via the rotation manager) carries
    the EMA shadow instead of silently resetting it."""
    from ddti_tpu.train.checkpoint import ManagedCheckpointer

    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               1e-3, steps_per_epoch=4, ema=True)
    planted = jax.tree.map(lambda p: p - 0.5, state.params)
    state = state.replace(ema_params=planted)
    mgr = ManagedCheckpointer(str(tmp_path / "periodic"), max_to_keep=2,
                              async_save=False)
    assert mgr.save(1, state)
    mgr.close()

    mgr2 = ManagedCheckpointer(str(tmp_path / "periodic"), max_to_keep=2,
                               async_save=False)
    fresh = create_train_state(model, jax.random.PRNGKey(9), (1, 32, 32, 1),
                               1e-3, steps_per_epoch=4, ema=True)
    restored, step = mgr2.restore_latest(fresh)
    mgr2.close()
    assert step == 1
    for a, b in zip(_leaves(restored.ema_params), _leaves(planted)):
        np.testing.assert_array_equal(a, b)

"""Three-way feature-composition audit (r5 follow-up).

The r5 12-pair audit found one real bug (--qat x --remat tracer leak),
so the highest-risk TRIPLES get regression coverage here: every test
composes three orthogonal train-step features that each rewrite part of
the step (lifted remat, masked optimizers, mutable collections, scanned
accumulation, guarded updates) and asserts the composition keeps the
pairwise semantics. The reference has none of these features; the rows
they extend are SURVEY.md section 2 rows 36-39 (trainer/step machinery).

All cases are full-tier (slow): tiny 32x32 models, 8 fake CPU devices.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.parallel import batch_sharding, make_mesh, replicated
from ddti_tpu.train import create_train_state, make_train_step
from ddti_tpu.train.engine import aug_config_from

pytestmark = pytest.mark.slow


def _cfg(**kw):
    base = dict(batch_size=8, image_size=32, store_size=32, lr=3e-3,
                model_type="ResUNet", use_mixup=False,
                compute_unused_losses=False)
    base.update(kw)
    return Config(**base)


def _batch(n=8, seed=0):
    im, ma = generate_ddti_like(n, (32, 32), seed)
    return jnp.asarray(im), jnp.asarray(ma)


def test_qat_remat_grad_accum():
    """--qat x --remat 0,1 x --grad_accum 2: the mutable qobs collection
    must survive BOTH the lifted checkpoint and the microbatch
    accumulation loop, and the recorded ranges must cover every tracked
    conv (positive amax after one step)."""
    cfg = _cfg(qat=True, grad_accum=2)
    model = create_model("ResUNet", base_filters=8, depth=3, remat=(0, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10, qat=True)
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    assert state.qstats and all(float(v) > 0 for v in state.qstats.values())


def test_qat_remat_dp_mesh(eight_devices):
    """--qat x --remat x --mesh data=8: the qobs amax observations are
    batch statistics (a max over the device-sharded batch), so the
    GSPMD-partitioned step must reduce them across shards — ranges and
    loss must equal the single-device run."""
    mesh = make_mesh({"data": 8}, eight_devices)
    cfg = _cfg(qat=True, batch_size=16)
    model = create_model("ResUNet", base_filters=8, depth=3, remat=True)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10, qat=True)
    im, ma = _batch(16)
    state2 = jax.device_put(jax.device_get(state), replicated(mesh))
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(5)
    new1, m1 = step(state, im, ma, key)
    with mesh:
        new2, m2 = step(state2, jax.device_put(im, batch_sharding(mesh)),
                        jax.device_put(ma, batch_sharding(mesh)), key)
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=2e-5)
    for k in new1.qstats:
        assert float(new1.qstats[k]) == pytest.approx(
            float(new2.qstats[k]), rel=2e-5), k


def test_distill_remat_grad_accum():
    """--distill_checkpoint x --remat x --grad_accum: the frozen teacher
    forward is fused inside each rematerialized microbatch; the blended
    loss must stay finite and actually train the student."""
    tmodel = create_model("UNet", base_filters=8, depth=3)
    tvars = tmodel.init({"params": jax.random.PRNGKey(7)},
                        jnp.zeros((1, 32, 32, 1), jnp.float32), train=False)
    tvars = {"params": tvars["params"], "batch_stats": tvars["batch_stats"]}
    cfg = _cfg(distill_weight=0.5, grad_accum=2)
    student = create_model("ResUNet", base_filters=8, depth=3, remat=True)
    state = create_train_state(student, jax.random.PRNGKey(1),
                               (1, 32, 32, 1), cfg.lr, steps_per_epoch=10)
    step = make_train_step(cfg, aug_config_from(cfg),
                           teacher_apply=tmodel.apply)
    im, ma = _batch()
    p0 = jax.tree.map(jnp.copy, state.params)
    state, m = step(state, im, ma, jax.random.PRNGKey(2), tvars)
    assert np.isfinite(float(m.loss))
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          p0, state.params)
    assert max(jax.tree.leaves(deltas)) > 0


def test_freeze_qat_grad_accum():
    """--freeze x --qat x --grad_accum: the masked AdamW must keep frozen
    params bit-identical while the qat range observation (which sees
    every conv, frozen or not) still records positive amaxes."""
    import jax.tree_util as jtu

    cfg = _cfg(model_type="UNet", qat=True, grad_accum=2,
               freeze="encoders")
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10, qat=True,
                               freeze=("encoders",))
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    p0 = jax.device_get(state.params)
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    assert state.qstats and all(float(v) > 0 for v in state.qstats.values())
    p1 = jax.device_get(state.params)
    moved_trainable = False
    for (kp, a), (_, b) in zip(jtu.tree_flatten_with_path(p0)[0],
                               jtu.tree_flatten_with_path(p1)[0]):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        if path.startswith("encoders"):
            np.testing.assert_array_equal(a, b, err_msg=path)
        elif float(np.max(np.abs(a - b))) > 0:
            moved_trainable = True
    assert moved_trainable


def test_ema_nan_guard_remat():
    """--ema_decay x --nan_guard x --remat: a poisoned batch must leave
    params AND the EMA shadow bit-untouched (skipped=1), and the next
    clean batch must resume training both."""
    cfg = _cfg(ema_decay=0.99, nan_guard=True)
    model = create_model("ResUNet", base_filters=8, depth=3, remat=True)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10, ema=True)
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    p0 = jax.device_get(state.params)
    e0 = jax.device_get(state.ema_params)
    bad = jnp.full_like(im.astype(jnp.float32), jnp.nan)
    state, m = step(state, bad, ma.astype(jnp.float32), jax.random.PRNGKey(1))
    assert float(m.skipped) == 1.0
    for a, b in zip(jax.tree.leaves(p0),
                    jax.tree.leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(e0),
                    jax.tree.leaves(jax.device_get(state.ema_params))):
        np.testing.assert_array_equal(a, b)
    state, m = step(state, im, ma, jax.random.PRNGKey(2))
    assert float(m.skipped) == 0.0
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                     e0, jax.device_get(state.ema_params))
    assert max(jax.tree.leaves(d)) > 0

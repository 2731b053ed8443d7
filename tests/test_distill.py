"""Knowledge distillation (train/distill.py).

The reference has no distillation; this extends the Trainer's capability
surface for the small-fast-student serving story. These tests pin the KD
loss semantics, the teacher plumbing through every train-step path
(stepwise, grad_accum, fused epoch, nan_guard), cross-architecture
teachers, and the Trainer/CLI integration via checkpoint loading.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.data import DeviceDataSource, generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import create_train_state, save_params_npz
from ddti_tpu.train.distill import kd_bce, soft_targets, teacher_from_config
from ddti_tpu.train.engine import aug_config_from
from ddti_tpu.train.steps import make_scan_epoch, make_train_step
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def _cfg(**kw):
    base = dict(batch_size=4, image_size=32, store_size=32, lr=3e-3,
                model_type="UNet", use_mixup=False,
                compute_unused_losses=False)
    base.update(kw)
    return Config(**base)


def _state(model, seed=0, lr=3e-3):
    return create_train_state(model, jax.random.PRNGKey(seed),
                              (1, 32, 32, 1), lr, steps_per_epoch=10)


def _batch(n=4, seed=0):
    im, ma = generate_ddti_like(n, (32, 32), seed)
    return jnp.asarray(im), jnp.asarray(ma)


def _teacher(seed=7, base_filters=8, depth=3, model_type="UNet"):
    model = create_model(model_type, base_filters=base_filters, depth=depth)
    state = _state(model, seed)
    return model, {"params": state.params,
                   "batch_stats": state.batch_stats}


# ---------------------------------------------------------------------------
# KD loss semantics
# ---------------------------------------------------------------------------


def test_kd_bce_gradient_zero_at_teacher_match():
    # grad wrt student logits is T*(sigmoid(sl/T) - soft): exactly zero
    # when the student reproduces the teacher's tempered probabilities
    tl = jnp.asarray([[-3.0, -0.5, 0.0, 2.0, 8.0]], jnp.float32)
    for temp in (1.0, 3.0):
        soft = jax.nn.sigmoid(tl / temp)
        g = jax.grad(lambda s: kd_bce(s, soft, temp))(tl)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_kd_bce_stable_at_extreme_logits():
    sl = jnp.asarray([-1e4, -50.0, 0.0, 50.0, 1e4], jnp.float32)
    soft = jnp.asarray([0.0, 0.2, 0.5, 0.8, 1.0], jnp.float32)
    v = kd_bce(sl, soft, 2.0)
    assert np.isfinite(float(v))
    g = jax.grad(lambda s: kd_bce(s, soft, 2.0))(sl)
    assert np.isfinite(np.asarray(g)).all()


def test_kd_bce_temperature_scaling_keeps_gradient_magnitude():
    # the T^2 factor keeps d(kd)/d(logit) = T*(sig(sl/T)-soft) bounded and
    # comparable across temperatures near sl=0
    sl = jnp.zeros((4,), jnp.float32)
    soft = jnp.full((4,), 0.9, jnp.float32)
    g1 = jax.grad(lambda s: kd_bce(s, soft, 1.0))(sl)
    g4 = jax.grad(lambda s: kd_bce(s, soft, 4.0))(sl)
    # both ~ -(soft-0.5)*T: same sign, same order of magnitude
    assert float(g1[0]) < 0 and float(g4[0]) < 0
    assert 0.2 < abs(float(g4[0]) / float(g1[0])) < 5.0


def test_soft_targets_stop_gradient_and_shape():
    model, tvars = _teacher()
    im, _ = _batch()
    x = im.astype(jnp.float32) / 255.0
    soft = soft_targets(model.apply, tvars, x, 2.0)
    assert soft.shape == (4, 32, 32, 1)
    assert soft.dtype == jnp.float32
    assert float(soft.min()) >= 0.0 and float(soft.max()) <= 1.0
    # no gradient flows into the teacher
    g = jax.grad(lambda v: soft_targets(model.apply, v, x, 2.0).sum())(
        tvars)
    assert all(float(jnp.abs(x).max()) == 0.0
               for x in jax.tree.leaves(g["params"]))


# ---------------------------------------------------------------------------
# the train step
# ---------------------------------------------------------------------------


def test_student_moves_toward_teacher():
    # pure-KD training (weight 1.0): the student's probabilities converge
    # toward the teacher's on a fixed batch
    cfg = _cfg(distill_weight=1.0, distill_temperature=1.0)
    im, ma = _batch()
    x = im.astype(jnp.float32) / 255.0
    # a freshly-initialized teacher outputs ~0.5 everywhere (nothing to
    # distill); fit it to the batch first so its predictions are
    # non-trivial targets
    tmodel = create_model("UNet", base_filters=8, depth=3)
    tstate = _state(tmodel, seed=7)
    from ddti_tpu.train.steps import make_host_train_step
    fit = make_host_train_step(_cfg())
    key = jax.random.PRNGKey(9)
    for _ in range(30):
        key, k = jax.random.split(key)
        tstate, _ = fit(tstate, x, ma.astype(jnp.float32) / 255.0, k)
    tvars = {"params": tstate.params, "batch_stats": tstate.batch_stats}

    student = create_model("UNet", base_filters=4, depth=2)
    state = _state(student, seed=1, lr=1e-2)
    # host step = no device augmentation: the student sees the SAME fixed
    # images every step, so pure-KD convergence is clean to measure
    step = make_host_train_step(cfg, teacher_apply=tmodel.apply)
    tprob = jax.nn.sigmoid(tmodel.apply(tvars, x, train=False))

    def gap(s):
        sprob = jax.nn.sigmoid(student.apply(
            {"params": s.params, "batch_stats": s.batch_stats},
            x, train=False))
        return float(jnp.abs(sprob - tprob).mean())

    g0 = gap(state)
    key = jax.random.PRNGKey(2)
    for _ in range(80):
        key, k = jax.random.split(key)
        state, m = step(state, x, ma.astype(jnp.float32) / 255.0, k, tvars)
    assert np.isfinite(float(m.loss))
    assert gap(state) < g0 * 0.8


def test_distill_blend_changes_loss():
    # weight 0 reproduces the plain step's loss; weight>0 shifts it
    tmodel, tvars = _teacher()
    im, ma = _batch()
    k = jax.random.PRNGKey(3)
    losses = {}
    for w in (0.0, 0.7):
        cfg = _cfg(distill_weight=w)
        student = create_model("UNet", base_filters=4, depth=2)
        state = _state(student, seed=1)
        step = make_train_step(cfg, aug_config_from(cfg),
                               teacher_apply=tmodel.apply)
        _, m = step(state, im, ma, k, tvars)
        losses[w] = float(m.loss)
    plain_cfg = _cfg()
    student = create_model("UNet", base_filters=4, depth=2)
    state = _state(student, seed=1)
    plain = make_train_step(plain_cfg, aug_config_from(plain_cfg))
    _, m = plain(state, im, ma, k)
    assert losses[0.0] == pytest.approx(float(m.loss), rel=1e-5)
    assert losses[0.7] != pytest.approx(float(m.loss), rel=1e-5)


def test_distill_grad_accum():
    cfg = _cfg(grad_accum=2, distill_weight=0.5)
    tmodel, tvars = _teacher()
    student = create_model("UNet", base_filters=4, depth=2)
    state = _state(student, seed=1)
    step = make_train_step(cfg, aug_config_from(cfg),
                           teacher_apply=tmodel.apply)
    im, ma = _batch()
    p0 = jax.tree.map(jnp.copy, state.params)
    state, m = step(state, im, ma, jax.random.PRNGKey(1), tvars)
    assert np.isfinite(float(m.loss))
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          p0, state.params)
    assert max(jax.tree.leaves(deltas)) > 0


def test_distill_cross_architecture_teacher():
    # ResUNet teacher supervising a UNet student
    cfg = _cfg(distill_weight=0.5)
    tmodel, tvars = _teacher(model_type="ResUNet")
    student = create_model("UNet", base_filters=4, depth=2)
    state = _state(student, seed=1)
    step = make_train_step(cfg, aug_config_from(cfg),
                           teacher_apply=tmodel.apply)
    im, ma = _batch()
    state, m = step(state, im, ma, jax.random.PRNGKey(1), tvars)
    assert np.isfinite(float(m.loss))


def test_distill_fused_epoch():
    cfg = _cfg(distill_weight=0.5)
    tmodel, tvars = _teacher()
    student = create_model("UNet", base_filters=4, depth=2)
    state = _state(student, seed=1)
    epoch = make_scan_epoch(cfg, aug_config_from(cfg),
                            teacher_apply=tmodel.apply)
    im, ma = _batch(n=8)
    idx = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)
    state, metrics = epoch(state, im, ma, idx, jax.random.PRNGKey(1), tvars)
    assert np.isfinite(np.asarray(metrics.loss)).all()


def test_distill_nan_guard_rejects():
    cfg = _cfg(distill_weight=0.5, nan_guard=True)
    tmodel, tvars = _teacher()
    student = create_model("UNet", base_filters=4, depth=2)
    state = _state(student, seed=1)
    step = make_train_step(cfg, aug_config_from(cfg),
                           teacher_apply=tmodel.apply)
    im, ma = _batch()
    bad = jnp.full_like(im.astype(jnp.float32), jnp.nan)
    p0 = jax.device_get(state.params)
    state2, m = step(state, bad, ma.astype(jnp.float32),
                     jax.random.PRNGKey(1), tvars)
    assert float(m.skipped) == 1.0
    for a, b in zip(jax.tree.leaves(p0),
                    jax.tree.leaves(jax.device_get(state2.params))):
        np.testing.assert_array_equal(a, b)


# ---------------------------------------------------------------------------
# teacher loading / Trainer integration
# ---------------------------------------------------------------------------


def test_teacher_from_config_off_by_default():
    assert teacher_from_config(_cfg()) == (None, None)


def test_teacher_from_config_loads_npz(tmp_path):
    tmodel, tvars = _teacher()
    ck = str(tmp_path / "teacher.npz")
    save_params_npz(ck, jax.device_get(tvars["params"]),
                    jax.device_get(tvars["batch_stats"]))
    cfg = _cfg(model_type="UNet", distill_checkpoint=ck,
               distill_base_filters=8, distill_depth=3)
    cfg.model_kwargs = dict(base_filters=4, depth=2)
    apply_fn, loaded = teacher_from_config(cfg)
    assert apply_fn is not None
    im, _ = _batch()
    x = im.astype(jnp.float32) / 255.0
    got = apply_fn(loaded, x, train=False)
    # loaded teacher reproduces the saved teacher's logits (up to the
    # bf16 compute policy teacher_from_config applies)
    want = tmodel.apply(tvars, x, train=False)
    assert float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                 - want.astype(jnp.float32)))) < 0.1


def test_trainer_distills_end_to_end(tmp_path):
    from ddti_tpu.core import create_logger
    from ddti_tpu.train import Trainer

    tmodel, tvars = _teacher()
    ck = str(tmp_path / "teacher.npz")
    save_params_npz(ck, jax.device_get(tvars["params"]),
                    jax.device_get(tvars["batch_stats"]))

    cfg = _cfg(epochs=1, base_dir=str(tmp_path),
               distill_checkpoint=ck, distill_base_filters=8,
               distill_depth=3, distill_weight=0.5)
    cfg.model_kwargs = dict(base_filters=4, depth=2)
    cfg.make_dirs()
    logger = create_logger(str(tmp_path / "log.log"))

    im, ma = generate_ddti_like(12, (32, 32), 0)
    src = DeviceDataSource(jnp.asarray(im[:8]), jnp.asarray(ma[:8]))
    val = DeviceDataSource(jnp.asarray(im[8:]), jnp.asarray(ma[8:]))
    student = create_model("UNet", base_filters=4, depth=2)
    tr = Trainer(cfg, (src, val, val), logger, student)
    assert tr._teacher_vars is not None
    tr.train()
    assert np.isfinite(tr.best_val_iou)


def test_lr_finder_with_distill(tmp_path):
    """--lr_find must work under --distill_checkpoint: the Trainer's step
    takes the teacher variables as its fifth argument and the finder has
    to pass them through."""
    from ddti_tpu.core import create_logger
    from ddti_tpu.train import Trainer
    from ddti_tpu.train.lr_finder import run_lr_finder

    tmodel, tvars = _teacher()
    ck = str(tmp_path / "teacher.npz")
    save_params_npz(ck, jax.device_get(tvars["params"]),
                    jax.device_get(tvars["batch_stats"]))
    cfg = _cfg(epochs=1, base_dir=str(tmp_path), distill_checkpoint=ck,
               distill_base_filters=8, distill_depth=3)
    cfg.model_kwargs = dict(base_filters=4, depth=2)
    cfg.make_dirs()
    logger = create_logger(str(tmp_path / "log.log"))
    im, ma = generate_ddti_like(8, (32, 32), 0)
    src = DeviceDataSource(jnp.asarray(im), jnp.asarray(ma))
    student = create_model("UNet", base_filters=4, depth=2)
    tr = Trainer(cfg, (src, src, src), logger, student)
    r = run_lr_finder(tr, num_steps=12, min_lr=1e-5, max_lr=1e-1)
    assert r["lr_steepest"] > 0


def test_ensemble_teacher(tmp_path):
    """--distill_checkpoint a,b: the teacher is the ensemble VOTE — the
    soft target equals the mean of the members' tempered sigmoids, and
    the student trains against it (ensemble quality at single-model
    serving cost)."""
    members = []
    cks = []
    for seed in (3, 4):
        tmodel, tvars = _teacher(seed=seed)
        ck = str(tmp_path / f"t{seed}.npz")
        save_params_npz(ck, jax.device_get(tvars["params"]),
                        jax.device_get(tvars["batch_stats"]))
        members.append(tvars)
        cks.append(ck)

    cfg = _cfg(distill_checkpoint=",".join(cks), distill_base_filters=8,
               distill_depth=3, distill_weight=0.6)
    cfg.model_kwargs = dict(base_filters=4, depth=2)
    apply_fn, stacked = teacher_from_config(cfg)
    im, ma = _batch()
    x = im.astype(jnp.float32) / 255.0
    T = 2.0
    got = soft_targets(apply_fn, stacked, x, T)
    want = np.mean([np.asarray(jax.nn.sigmoid(
        tmodel.apply(v, x, train=False).astype(jnp.float32) / T))
        for v in members], axis=0)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2)

    student = create_model("UNet", base_filters=4, depth=2)
    state = _state(student, seed=1)
    step = make_train_step(cfg, aug_config_from(cfg),
                           teacher_apply=apply_fn)
    state, m = step(state, im, ma, jax.random.PRNGKey(1), stacked)
    assert np.isfinite(float(m.loss))

    # the autobatch probe handles the comma list abstractly (no file read
    # needed beyond arch flags)
    from ddti_tpu.train.autobatch import predicted_step_peak_bytes
    peak = predicted_step_peak_bytes(cfg, student, 4)
    solo = predicted_step_peak_bytes(
        _cfg(distill_checkpoint=cks[0], distill_base_filters=8,
             distill_depth=3), student, 4)
    assert peak > solo > 0


def test_distill_kwargs_reach_teacher(tmp_path):
    """--distill_kwargs passes behavior-only kwargs into the teacher
    build — a TransUNet teacher with batch_axis_attention=True computes
    differently from the default despite identical param shapes."""
    tmodel = create_model("TransUNet", base_filters=8, depth=3,
                          image_size=32, batch_axis_attention=True)
    tvars = {"params": None}
    import jax as _jax
    v = tmodel.init({"params": _jax.random.PRNGKey(0)},
                    jnp.zeros((1, 32, 32, 1)), train=False)
    ck = str(tmp_path / "t.npz")
    save_params_npz(ck, jax.device_get(v["params"]),
                    jax.device_get(v.get("batch_stats", {})))

    im, _ = _batch()
    x = im.astype(jnp.float32) / 255.0
    base = dict(model_type="UNet", image_size=32,
                distill_checkpoint=ck, distill_model_type="TransUNet",
                distill_base_filters=8, distill_depth=3,
                use_amp_autocast=False)
    cfg_plain = _cfg(**base)
    cfg_quirk = _cfg(**base,
                     distill_kwargs='{"batch_axis_attention": true}')
    for c in (cfg_plain, cfg_quirk):
        c.model_kwargs = dict(base_filters=4, depth=2)
    a_plain, v_plain = teacher_from_config(cfg_plain)
    a_quirk, v_quirk = teacher_from_config(cfg_quirk)
    lp = a_plain(v_plain, x, train=False)
    lq = a_quirk(v_quirk, x, train=False)
    assert float(jnp.max(jnp.abs(lp - lq))) > 1e-4
    # the quirk teacher reproduces the checkpoint's own forward
    want = tmodel.apply(v, x, train=False)
    assert float(jnp.max(jnp.abs(lq - want))) < 1e-4

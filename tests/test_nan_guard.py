"""--nan_guard (non-finite step rejection) and --clip_grad_norm tests.

The reference has no divergence handling at all (a NaN loss silently
poisons the weights and every later epoch, /root/reference/utils/
trainer.py:83-93); these are the production-framework additions on top.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config, create_logger
from ddti_tpu.data import DeviceDataSource, generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import Trainer, create_train_state
from ddti_tpu.train.state import make_optimizer
from ddti_tpu.train.steps import make_host_train_step, make_train_step
from ddti_tpu.train.engine import aug_config_from
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def _tiny_cfg(tmp, **kw):
    base = dict(epochs=1, batch_size=4, image_size=32, store_size=32,
                lr=3e-3, model_type="UNet", base_dir=str(tmp))
    base.update(kw)
    return Config(**base)


def _tiny_state(cfg, seed=0):
    model = create_model("UNet", base_filters=8, depth=3)
    return model, create_train_state(
        model, jax.random.PRNGKey(seed), (1, 32, 32, 1), cfg.lr,
        steps_per_epoch=10)


def _nan_batch(n=4):
    im = np.full((n, 32, 32, 1), np.nan, np.float32)
    ma = np.zeros((n, 32, 32, 1), np.float32)
    return jnp.asarray(im), jnp.asarray(ma)


def _good_batch(n=4, seed=0):
    im, ma = generate_ddti_like(n, (32, 32), seed)
    return (jnp.asarray(im).astype(jnp.float32) / 255.0,
            jnp.asarray(ma).astype(jnp.float32) / 255.0)


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def test_nan_guard_skips_poisoned_step(tmp_path):
    cfg = _tiny_cfg(tmp_path, nan_guard=True)
    _, state = _tiny_state(cfg)
    before_p = _leaves(jax.device_get(state.params))
    before_o = _leaves(jax.device_get(state.opt_state))
    step0 = int(state.step)
    step = make_host_train_step(cfg)

    state, m = step(state, *_nan_batch(), jax.random.PRNGKey(1))

    assert float(m.skipped) == 1.0
    # the step contributes NOTHING to epoch metrics
    assert float(m.loss) == 0.0 and float(m.n) == 0.0
    assert float(m.counts.tp) == 0.0
    # the whole state is kept, step counter included (the reject retries
    # at the same schedule position)
    assert int(state.step) == step0
    for a, b in zip(before_p, _leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(before_o, _leaves(jax.device_get(state.opt_state))):
        np.testing.assert_array_equal(a, b)


def test_nan_guard_off_poisons_params(tmp_path):
    """Sanity: the NaN batch really does destroy the weights without the
    guard (the reference's behavior)."""
    cfg = _tiny_cfg(tmp_path, nan_guard=False)
    _, state = _tiny_state(cfg)
    step = make_host_train_step(cfg)
    state, m = step(state, *_nan_batch(), jax.random.PRNGKey(1))
    assert not np.isfinite(float(m.loss))
    assert any(not np.isfinite(x).all()
               for x in _leaves(jax.device_get(state.params)))


def test_nan_guard_passes_finite_steps(tmp_path):
    cfg = _tiny_cfg(tmp_path, nan_guard=True)
    _, state = _tiny_state(cfg)
    before = _leaves(jax.device_get(state.params))
    step = make_host_train_step(cfg)
    state, m = step(state, *_good_batch(), jax.random.PRNGKey(1))
    assert float(m.skipped) == 0.0
    assert np.isfinite(float(m.loss)) and float(m.n) == 4.0
    assert int(state.step) == 1
    after = _leaves(jax.device_get(state.params))
    assert any(not np.array_equal(a, b) for a, b in zip(before, after))


def test_nan_guard_matches_unguarded_on_finite_steps(tmp_path):
    """With finite inputs the guard is a pure pass-through: bit-identical
    params to the unguarded step."""
    on = _tiny_cfg(tmp_path, nan_guard=True, base_dir=str(tmp_path / "a"))
    off = _tiny_cfg(tmp_path, nan_guard=False, base_dir=str(tmp_path / "b"))
    _, s_on = _tiny_state(on)
    _, s_off = _tiny_state(off)
    b = _good_batch()
    s_on, _ = make_host_train_step(on)(s_on, *b, jax.random.PRNGKey(1))
    s_off, _ = make_host_train_step(off)(s_off, *b, jax.random.PRNGKey(1))
    for a, c in zip(_leaves(jax.device_get(s_on.params)),
                    _leaves(jax.device_get(s_off.params))):
        np.testing.assert_array_equal(a, c)


def test_nan_guard_grad_accum_rejects_whole_step(tmp_path):
    """One poisoned microbatch inside a grad_accum scan rejects the whole
    accumulated update (the summed gradient is non-finite)."""
    cfg = _tiny_cfg(tmp_path, nan_guard=True, grad_accum=2)
    _, state = _tiny_state(cfg)
    before = _leaves(jax.device_get(state.params))
    im, ma = _good_batch(4)
    im = im.at[0].set(jnp.nan)  # first microbatch poisoned
    step = make_host_train_step(cfg)
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert float(m.skipped) == 1.0
    for a, b in zip(before, _leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(a, b)


def test_nan_guard_device_uint8_path_compiles(tmp_path):
    """The guard also threads the full on-device augmentation step
    (uint8 store batches can't carry NaN, but the guarded program must
    trace/compile and behave as a pass-through)."""
    cfg = _tiny_cfg(tmp_path, nan_guard=True)
    _, state = _tiny_state(cfg)
    im, ma = generate_ddti_like(4, (32, 32), 0)
    step = make_train_step(cfg, aug_config_from(cfg))
    state, m = step(state, jnp.asarray(im), jnp.asarray(ma),
                    jax.random.PRNGKey(1))
    assert float(m.skipped) == 0.0 and np.isfinite(float(m.loss))


class _NaNSource:
    """Host-streaming source that always yields NaN float batches."""

    def __init__(self, n=16, batch=4):
        self.dataset = list(range(n))
        self._batch = batch

    def __iter__(self):
        for _ in range(len(self.dataset) // self._batch):
            yield (np.full((self._batch, 32, 32, 1), np.nan, np.float32),
                   np.zeros((self._batch, 32, 32, 1), np.float32))


def test_trainer_stops_gracefully_on_divergence(tmp_path):
    """Patience exhausted -> the run stops mid-epoch, keeps finite weights
    and still writes the last checkpoint (no crash, no NaN artifacts)."""
    cfg = _tiny_cfg(tmp_path, epochs=3, nan_guard=True,
                    nan_guard_patience=2)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    val = DeviceDataSource(*generate_ddti_like(4, (32, 32), 1))
    test = DeviceDataSource(*generate_ddti_like(4, (32, 32), 2))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, (_NaNSource(), val, test), logger, model)
    tr.train()
    assert tr._diverged
    assert tr._consecutive_skips >= 2
    for x in _leaves(jax.device_get(tr.state.params)):
        assert np.isfinite(x).all()
    assert os.path.isdir(os.path.join(cfg.model_dir, "UNet_last"))


def test_clip_grad_norm_chains_into_adamw():
    """make_optimizer(clip_norm=c) == manual pre-clip + bare optimizer,
    and diverges from the unclipped optimizer once moment history differs
    (Adam is single-step scale-invariant, so the test uses two steps with
    DIFFERENT gradient scales to expose the clip)."""
    params = {"w": jnp.zeros(4, jnp.float32)}
    g1 = {"w": jnp.full(4, 100.0, jnp.float32)}   # ||g|| = 200 -> clipped
    g2 = {"w": jnp.full(4, 1.0, jnp.float32)}     # ||g|| = 2   -> clipped

    def run(tx, grads_seq):
        import optax
        p, st = params, tx.init(params)
        for g in grads_seq:
            upd, st = tx.update(g, st, p)
            p = optax.apply_updates(p, upd)
        return np.asarray(p["w"])

    clip, _ = make_optimizer(1e-3, 10, clip_norm=1.0)
    bare, _ = make_optimizer(1e-3, 10)
    manual = run(bare, [{"w": g1["w"] / 200.0}, {"w": g2["w"] / 2.0}])
    np.testing.assert_allclose(run(clip, [g1, g2]), manual, rtol=1e-6)
    assert not np.allclose(run(clip, [g1, g2]), run(bare, [g1, g2]))


def test_clip_grad_norm_through_train_step(tmp_path):
    """The CLI flag reaches the Trainer's optimizer: a clipped run takes a
    different (finite, bounded) first step than the unclipped one."""
    a = _tiny_cfg(tmp_path, clip_grad_norm=1e-3, base_dir=str(tmp_path / "a"))
    b = _tiny_cfg(tmp_path, clip_grad_norm=0.0, base_dir=str(tmp_path / "b"))
    for cfg in (a, b):
        cfg.make_dirs()
    model = create_model("UNet", base_filters=8, depth=3)
    srcs = tuple(DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
                 for n, s in ((8, 0), (4, 1), (4, 2)))
    states = []
    for cfg in (a, b):
        logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
        tr = Trainer(cfg, srcs, logger, model)
        tr.train_one_epoch(0)
        states.append(jax.device_get(tr.state.params))
    la, lb = _leaves(states[0]), _leaves(states[1])
    assert all(np.isfinite(x).all() for x in la)
    assert any(not np.array_equal(x, y) for x, y in zip(la, lb))

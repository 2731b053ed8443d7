"""Parameter freezing for fine-tuning (--freeze, train/state.py).

The reference has no transfer-learning support; --freeze masks AdamW
per-leaf (optax.multi_transform) so frozen params get no updates AND no
decoupled weight decay, with optional pinning of frozen modules' BN
running statistics. These tests pin the mask semantics, the interaction
with clipping/grad-accum, and the warm-start fine-tune workflow.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import create_train_state
from ddti_tpu.train.engine import aug_config_from
from ddti_tpu.train.state import freeze_labels, keep_frozen_bstats
from ddti_tpu.train.steps import make_train_step
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def _cfg(**kw):
    base = dict(batch_size=4, image_size=32, store_size=32, lr=3e-3,
                model_type="ResUNet", use_mixup=False,
                compute_unused_losses=False)
    base.update(kw)
    return Config(**base)


def _state(freeze=(), seed=0, **kw):
    model = create_model("ResUNet", base_filters=8, depth=3)
    return model, create_train_state(
        model, jax.random.PRNGKey(seed), (1, 32, 32, 1), 3e-3,
        steps_per_epoch=10, freeze=freeze, **kw)


def _batch(n=4, seed=0):
    im, ma = generate_ddti_like(n, (32, 32), seed)
    return jnp.asarray(im), jnp.asarray(ma)


def _deltas_by_prefix(p0, p1):
    import jax.tree_util as jtu
    out = {}
    for (kp, a), b in zip(jtu.tree_flatten_with_path(p0)[0],
                          jax.tree.leaves(p1)):
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        out[path] = float(jnp.max(jnp.abs(a - b)))
    return out


def test_freeze_labels_prefix_semantics():
    _, state = _state()
    labels, n = freeze_labels(state.params, ("encoders",))
    assert n > 0
    import jax.tree_util as jtu
    for kp, lab in jtu.tree_flatten_with_path(labels)[0]:
        path = "/".join(str(getattr(k, "key", k)) for k in kp)
        assert lab == ("frozen" if path.startswith("encoders")
                       else "trainable"), path


def test_freeze_rejects_no_match():
    with pytest.raises(ValueError, match="matched no parameters"):
        _state(freeze=("no_such_module",))


def test_frozen_params_fixed_trainable_move():
    cfg = _cfg(freeze="encoders,bottleneck")
    model, state = _state(freeze=("encoders", "bottleneck"))
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    p0 = jax.device_get(state.params)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, m = step(state, im, ma, k)
    assert np.isfinite(float(m.loss))
    d = _deltas_by_prefix(p0, jax.device_get(state.params))
    frozen = {p: v for p, v in d.items()
              if p.startswith(("encoders", "bottleneck"))}
    trainable = {p: v for p, v in d.items() if p not in frozen}
    assert frozen and max(frozen.values()) == 0.0
    assert max(trainable.values()) > 0.0


def test_freeze_blocks_weight_decay():
    # zero-gradient leaves would still decay under plain AdamW; the mask
    # must stop that too. One step with constant-zero images: encoder
    # grads are ~0 anyway, but decay would shrink weights measurably at
    # wd=0.5 — frozen params must stay bit-identical.
    cfg = _cfg(freeze="encoders")
    model, state = _state(freeze=("encoders",), weight_decay=0.5)
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    p0 = jax.device_get(state.params)
    state, _ = step(state, im, ma, jax.random.PRNGKey(1))
    d = _deltas_by_prefix(p0, jax.device_get(state.params))
    assert max(v for p, v in d.items() if p.startswith("encoders")) == 0.0
    # and an UNfrozen state with the same wd does move its encoders
    model2, state2 = _state(weight_decay=0.5)
    step2 = make_train_step(_cfg(), aug_config_from(_cfg()))
    state2, _ = step2(state2, im, ma, jax.random.PRNGKey(1))
    d2 = _deltas_by_prefix(jax.device_get(p0),
                           jax.device_get(state2.params))
    assert max(v for p, v in d2.items() if p.startswith("encoders")) > 0.0


def test_freeze_with_clip_and_grad_accum():
    cfg = _cfg(freeze="encoders", grad_accum=2, clip_grad_norm=1.0)
    model, state = _state(freeze=("encoders",), clip_norm=1.0)
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    p0 = jax.device_get(state.params)
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    d = _deltas_by_prefix(p0, jax.device_get(state.params))
    assert max(v for p, v in d.items() if p.startswith("encoders")) == 0.0
    assert max(v for p, v in d.items()
               if not p.startswith("encoders")) > 0.0


def test_freeze_bn_stats_pins_running_stats():
    im, ma = _batch()
    for pin, expect_fixed in ((True, True), (False, False)):
        cfg = _cfg(freeze="encoders", freeze_bn_stats=pin)
        model, state = _state(freeze=("encoders",))
        step = make_train_step(cfg, aug_config_from(cfg))
        s0 = jax.device_get(state.batch_stats)
        state, _ = step(state, im, ma, jax.random.PRNGKey(1))
        d = _deltas_by_prefix(s0, jax.device_get(state.batch_stats))
        enc = max(v for p, v in d.items() if p.startswith("encoders"))
        dec = max(v for p, v in d.items() if p.startswith("decoders"))
        assert (enc == 0.0) == expect_fixed
        assert dec > 0.0  # unfrozen stats always adapt


def test_keep_frozen_bstats_helper():
    _, state = _state()
    new = jax.tree.map(lambda x: x + 1.0, state.batch_stats)
    merged = keep_frozen_bstats(new, state.batch_stats, ("encoders",))
    d = _deltas_by_prefix(jax.device_get(state.batch_stats),
                          jax.device_get(merged))
    assert max(v for p, v in d.items() if p.startswith("encoders")) == 0.0
    assert min(v for p, v in d.items()
               if not p.startswith("encoders")) == 1.0


def test_finetune_warm_start_workflow(tmp_path):
    """The real workflow: train a 'pretrained' model, save, reload into a
    frozen-encoder run, fine-tune — loss stays finite, decoder adapts,
    encoder equals the pretrained weights throughout."""
    from ddti_tpu.train.checkpoint import (
        load_params_npz,
        save_params_npz,
    )

    cfg = _cfg()
    model, state = _state()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, _ = step(state, im, ma, k)
    ck = str(tmp_path / "pre.npz")
    save_params_npz(ck, jax.device_get(state.params),
                    jax.device_get(state.batch_stats))

    model2, fresh = _state(freeze=("encoders",), seed=9)
    params, stats = load_params_npz(ck, fresh.params, fresh.batch_stats)
    fresh = fresh.replace(params=params, batch_stats=stats)
    cfg2 = _cfg(freeze="encoders")
    step2 = make_train_step(cfg2, aug_config_from(cfg2))
    pre = jax.device_get(params)
    for _ in range(3):
        key, k = jax.random.split(key)
        fresh, m = step2(fresh, im, ma, k)
    assert np.isfinite(float(m.loss))
    d = _deltas_by_prefix(pre, jax.device_get(fresh.params))
    assert max(v for p, v in d.items() if p.startswith("encoders")) == 0.0
    assert max(v for p, v in d.items()
               if p.startswith("decoders")) > 0.0


def test_warm_start_orbax_across_optimizer_change(tmp_path):
    """The advertised fine-tune pairing: --checkpoint_path <orbax dir of a
    plain run> + --freeze. Weights-only loading must not touch the saved
    opt_state (whose structure differs under the optimizer mask)."""
    from ddti_tpu.train.checkpoint import (
        load_checkpoint_into,
        save_checkpoint,
    )

    model, plain = _state()
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, plain)

    _, frozen = _state(freeze=("encoders",), seed=5)
    params, stats = load_checkpoint_into(ck, "ResUNet", frozen.params,
                                         frozen.batch_stats,
                                         prefer_ema=False)
    for a, b in zip(jax.tree.leaves(jax.device_get(plain.params)),
                    jax.tree.leaves(jax.device_get(params))):
        np.testing.assert_array_equal(a, b)
    # and the state trains under the mask afterwards
    frozen = frozen.replace(params=params, batch_stats=stats)
    cfg = _cfg(freeze="encoders")
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    frozen, m = step(frozen, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))


def test_lr_finder_respects_freeze(tmp_path):
    """--lr_find under --freeze probes the masked optimizer: frozen
    params stay bit-identical through the whole sweep."""
    from ddti_tpu.core import create_logger
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.train import Trainer
    from ddti_tpu.train.lr_finder import run_lr_finder

    cfg = _cfg(epochs=1, base_dir=str(tmp_path), freeze="encoders")
    cfg.model_kwargs = dict(base_filters=8, depth=3)
    cfg.make_dirs()
    logger = create_logger(str(tmp_path / "log.log"))
    im, ma = _batch(n=8)
    src = DeviceDataSource(im, ma)
    model = create_model("ResUNet", base_filters=8, depth=3)
    tr = Trainer(cfg, (src, src, src), logger, model)
    p0 = jax.device_get(tr.state.params)
    r = run_lr_finder(tr, num_steps=12, min_lr=1e-5, max_lr=1e-1)
    assert r["lr_steepest"] > 0
    # the trainer's own state is untouched by design; the sweep itself
    # ran on a masked optimizer (no crash, finite suggestions)
    for a, b in zip(jax.tree.leaves(p0),
                    jax.tree.leaves(jax.device_get(tr.state.params))):
        np.testing.assert_array_equal(a, b)


def test_freeze_prefix_segment_boundaries():
    """Prefix matching is segment-aware: 'layers_1' must not catch
    'layers_10', while the auto-numbered convenience ('encoders' ->
    'encoders_0') keeps working."""
    from ddti_tpu.train.state import _freeze_match

    assert _freeze_match("encoders_0/conv1/kernel", ("encoders",))
    assert _freeze_match("encoders_0/conv1/kernel", ("encoders_0",))
    assert _freeze_match("encoders_0/conv1/kernel", ("encoders_0/conv1",))
    assert not _freeze_match("encoders_0/conv1/kernel", ("enc",))
    assert not _freeze_match("layers_10/w", ("layers_1",))
    assert _freeze_match("layers_10/w", ("layers",))
    assert not _freeze_match("conv1x1/kernel", ("conv1",))
    assert not _freeze_match("encoders_0/conv10/k", ("encoders_0/conv1",))

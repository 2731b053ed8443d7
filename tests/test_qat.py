"""Quantization-aware training (train/qat.py).

The reference has no quantization at all; QAT extends the int8 serving
path (train/quantize.py) with fake-quantized training and learned
activation ranges. These tests pin the STE semantics, the range-EMA
plumbing through the train step (incl. grad_accum and --nan_guard), the
checkpoint round-trip, and the export handoff into the int8 graph.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import create_train_state
from ddti_tpu.train.checkpoint import (
    load_qstats,
    restore_checkpoint,
    save_checkpoint,
    save_params_npz,
)
from ddti_tpu.train.engine import aug_config_from
from ddti_tpu.train.qat import (
    fake_quant,
    qat_apply,
    qstats_amax,
)
from ddti_tpu.train.quantize import (
    calibrate_conv_amax,
    quantize_serving,
    quantized_apply,
)
from ddti_tpu.train.steps import make_train_step
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def _tiny_cfg(**kw):
    base = dict(batch_size=4, image_size=32, store_size=32, lr=3e-3,
                model_type="UNet", use_mixup=False, qat=True,
                compute_unused_losses=False)
    base.update(kw)
    return Config(**base)


def _tiny(seed=0, qat=True, min_channels=0, **model_kw):
    model = create_model("UNet", base_filters=8, depth=3, **model_kw)
    state = create_train_state(model, jax.random.PRNGKey(seed),
                               (1, 32, 32, 1), 3e-3, steps_per_epoch=10,
                               qat=qat, quant_min_channels=min_channels)
    return model, state


def _batch(n=4, seed=0):
    im, ma = generate_ddti_like(n, (32, 32), seed)
    return jnp.asarray(im), jnp.asarray(ma)


# ---------------------------------------------------------------------------
# fake-quant semantics
# ---------------------------------------------------------------------------


def test_fake_quant_forward_is_int8_rounding():
    s = jnp.float32(0.013)
    x = jnp.asarray([-3.0, -0.02, 0.0, 0.0064, 0.0066, 1.0, 5.0],
                    jnp.float32)
    got = fake_quant(x, s)
    want = jnp.clip(jnp.round(x / s), -127, 127) * s
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-7)


def test_fake_quant_ste_gradients_clipped():
    s = jnp.float32(0.01)  # representable range +-1.27
    x = jnp.asarray([-2.0, -1.0, -0.004, 0.3, 1.26, 3.0], jnp.float32)
    g = jax.grad(lambda v: jnp.sum(fake_quant(v, s)))(x)
    np.testing.assert_allclose(np.asarray(g),
                               [0.0, 1.0, 1.0, 1.0, 1.0, 0.0])


def test_fake_quant_per_channel_scale_broadcasts():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8))
    sw = jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0
    q = fake_quant(w, sw)
    assert q.shape == w.shape
    # the per-channel max is exactly representable -> error strictly below
    # half a step everywhere
    err = jnp.max(jnp.abs(q - w) / sw)
    assert float(err) <= 0.5 + 1e-6


# ---------------------------------------------------------------------------
# range discovery / observation
# ---------------------------------------------------------------------------


def test_init_qstats_matches_calibration_paths():
    model, state = _tiny()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    im, _ = _batch()
    amax = calibrate_conv_amax(model, variables,
                               im.astype(jnp.float32) / 255.0)
    assert set(state.qstats) == {"/".join(p) for p in amax}
    assert all(float(v) == 0.0 for v in state.qstats.values())


def test_init_qstats_min_channels_filters():
    model, state = _tiny(min_channels=16)
    model_all, state_all = _tiny(min_channels=0)
    assert set(state.qstats) < set(state_all.qstats)
    assert state.qstats  # the deep levels (>=16ch) are still tracked


def test_qat_apply_observes_and_runs():
    model, state = _tiny()
    im, _ = _batch()
    x = im.astype(jnp.float32) / 255.0
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    (out, _), observed = qat_apply(model.apply, variables, x, state.qstats,
                                   train=True, mutable=["batch_stats"])
    assert out.shape == (4, 32, 32, 1)
    assert set(observed) == set(state.qstats)
    assert all(float(v) > 0 for v in observed.values())
    # fake-quant is actually active: logits differ from the float path
    # (by quantization-sized amounts only)
    fl = model.apply(variables, x, train=True, mutable=["batch_stats"])[0]
    d = float(jnp.max(jnp.abs(out - fl)))
    assert 0 < d < 0.5 * float(jnp.max(jnp.abs(fl)) + 1.0)


# ---------------------------------------------------------------------------
# the train step
# ---------------------------------------------------------------------------


def test_qat_train_step_updates_ranges_and_params():
    cfg = _tiny_cfg()
    model, state = _tiny()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    p0 = jax.tree.map(jnp.copy, state.params)
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    assert all(float(v) > 0 for v in state.qstats.values())
    # params actually trained
    deltas = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                          p0, state.params)
    assert max(jax.tree.leaves(deltas)) > 0
    # second step: EMA moves (decay blends old and fresh)
    q1 = {k: float(v) for k, v in state.qstats.items()}
    state, m = step(state, im, ma, jax.random.PRNGKey(2))
    q2 = {k: float(v) for k, v in state.qstats.items()}
    assert any(abs(q2[k] - q1[k]) > 0 for k in q1)
    assert all(v > 0 for v in q2.values())


@pytest.mark.parametrize("remat", [True, (0, 1)])
def test_qat_composes_with_remat(remat):
    """--qat x --remat (full or per-level): the amax observations ride a
    mutable 'qobs' collection, so nn.remat's lifted checkpoint threads
    them instead of leaking tracers from a Python side dict (the r5
    UnexpectedTracerError regression)."""
    from ddti_tpu.models import create_model
    from ddti_tpu.train import create_train_state

    cfg = _tiny_cfg()
    model = create_model("ResUNet", base_filters=8, depth=3, remat=remat)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10, qat=True)
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    assert all(float(v) > 0 for v in state.qstats.values())


def test_qat_grad_accum_observes_max():
    cfg = _tiny_cfg(grad_accum=2)
    model, state = _tiny()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    assert all(float(v) > 0 for v in state.qstats.values())


def test_qat_nan_guard_rejects_range_update():
    cfg = _tiny_cfg(nan_guard=True)
    model, state = _tiny()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    # poison the images through float conversion: a nan batch must leave
    # params AND qstats untouched
    bad = jnp.full_like(im.astype(jnp.float32), jnp.nan)
    p0 = jax.device_get(state.params)
    state2, m = step(state, bad, ma.astype(jnp.float32),
                     jax.random.PRNGKey(1))
    assert float(m.skipped) == 1.0
    assert all(float(v) == 0.0 for v in state2.qstats.values())
    leaves0 = jax.tree.leaves(p0)
    leaves1 = jax.tree.leaves(jax.device_get(state2.params))
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(a, b)


def test_qat_fused_epoch_carries_ranges():
    from ddti_tpu.train.steps import make_scan_epoch

    cfg = _tiny_cfg()
    model, state = _tiny()
    epoch = make_scan_epoch(cfg, aug_config_from(cfg))
    im, ma = _batch(n=8)
    idx = jnp.arange(8, dtype=jnp.int32).reshape(2, 4)  # 2 steps of 4
    state, metrics = epoch(state, im, ma, idx, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics.loss)).all()
    assert all(float(v) > 0 for v in state.qstats.values())


def test_qat_transunet_convs_only():
    # attention/dense stay float; every plain conv (incl. the decoder
    # conv-transposes) is tracked and trained fake-quantized
    model = create_model("TransUNet", base_filters=8, depth=3,
                         image_size=32, embed_dim=32, num_heads=2,
                         num_layers=1)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, 32, 32, 1), 3e-3, steps_per_epoch=10,
                               qat=True)
    assert state.qstats
    cfg = _tiny_cfg(model_type="TransUNet")
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, m = step(state, im, ma, jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))
    assert all(float(v) > 0 for v in state.qstats.values())


def test_qat_tracks_conv_transpose_upconvs():
    _, state = _tiny()
    # the UNet decoder upconvs are nn.ConvTranspose modules; their paths
    # must be range-tracked like the plain convs (they quantize at export)
    assert any("up" in p or "convt" in p.lower() for p in state.qstats), \
        sorted(state.qstats)


# ---------------------------------------------------------------------------
# export handoff
# ---------------------------------------------------------------------------


def test_quantize_serving_needs_exactly_one_range_source():
    model, state = _tiny()
    with pytest.raises(ValueError):
        quantize_serving(model, state.params, state.batch_stats)
    with pytest.raises(ValueError):
        quantize_serving(model, state.params, state.batch_stats,
                         jnp.zeros((1, 32, 32, 1)),
                         amax={("final_conv",): 1.0})


def test_qat_ranges_drive_int8_export():
    cfg = _tiny_cfg()
    model, state = _tiny()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        state, _ = step(state, im, ma, k)
    amax = qstats_amax(state.qstats)
    assert amax and all(v > 0 for v in amax.values())
    svars = quantize_serving(model, jax.device_get(state.params),
                             jax.device_get(state.batch_stats),
                             amax=amax)
    x = im.astype(jnp.float32) / 255.0
    ql = quantized_apply(model, svars, x, train=False)
    fl = model.apply({"params": state.params,
                      "batch_stats": state.batch_stats}, x, train=False)
    # int8 rounding error only — logits stay close at these scales
    assert float(jnp.max(jnp.abs(ql - fl))) < 0.35 * float(
        jnp.max(jnp.abs(fl)) + 1.0)


def test_qat_amax_ignores_stale_paths():
    model, state = _tiny()
    amax = {tuple(k.split("/")): 1.0 for k in state.qstats}
    amax[("no", "such", "conv")] = 1.0  # e.g. a different-depth checkpoint
    svars = quantize_serving(model, jax.device_get(state.params),
                             jax.device_get(state.batch_stats), amax=amax)
    # the stale path was dropped, the real ones quantized
    assert "quant" in svars and svars["quant"]
    assert "no" not in svars["quant"]


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------


def test_qat_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_cfg()
    model, state = _tiny()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, _ = step(state, im, ma, jax.random.PRNGKey(1))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, state)

    # same-flags restore: ranges come back exactly
    _, fresh = _tiny(seed=3)
    restored = restore_checkpoint(ck, fresh)
    for k, v in state.qstats.items():
        assert float(restored.qstats[k]) == pytest.approx(float(v))

    # restoring into a non-QAT run drops the ranges
    _, plain = _tiny(seed=3, qat=False)
    restored = restore_checkpoint(ck, plain)
    assert restored.qstats is None

    # restoring a non-QAT checkpoint into a QAT run keeps the zeros init
    _, plain = _tiny(seed=4, qat=False)
    ck2 = str(tmp_path / "ck2")
    save_checkpoint(ck2, plain)
    _, wants = _tiny(seed=5)
    restored = restore_checkpoint(ck2, wants)
    assert restored.qstats is not None
    assert all(float(v) == 0.0 for v in restored.qstats.values())


def test_qat_npz_carries_ranges(tmp_path):
    cfg = _tiny_cfg()
    model, state = _tiny()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, _ = step(state, im, ma, jax.random.PRNGKey(1))
    p = str(tmp_path / "w.npz")
    save_params_npz(p, jax.device_get(state.params),
                    jax.device_get(state.batch_stats),
                    qstats=jax.device_get(state.qstats))
    qs = load_qstats(p)
    assert qs is not None and set(qs) == set(state.qstats)
    assert all(v > 0 for v in qs.values())
    # a plain weights npz reports no ranges
    p2 = str(tmp_path / "plain.npz")
    save_params_npz(p2, jax.device_get(state.params),
                    jax.device_get(state.batch_stats))
    assert load_qstats(p2) is None


def test_load_qstats_from_orbax_dir(tmp_path):
    cfg = _tiny_cfg()
    model, state = _tiny()
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, _ = step(state, im, ma, jax.random.PRNGKey(1))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, state)
    qs = load_qstats(ck)
    assert qs is not None and set(qs) == set(state.qstats)
    _, plain = _tiny(qat=False)
    ck2 = str(tmp_path / "ck2")
    save_checkpoint(ck2, plain)
    assert load_qstats(ck2) is None


def test_qat_restore_across_min_channels_change(tmp_path):
    """Restoring a --qat checkpoint into a run with a DIFFERENT
    --quant_min_channels keeps the overlapping ranges (per-key merge via
    the checkpoint-metadata-derived template) instead of crashing on the
    key-set mismatch."""
    cfg = _tiny_cfg()
    model, state = _tiny(min_channels=16)  # fewer tracked convs
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = _batch()
    state, _ = step(state, im, ma, jax.random.PRNGKey(1))
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, state)

    # restore into an all-convs run: overlap restored, new keys zero
    _, wide = _tiny(seed=3, min_channels=0)
    assert set(state.qstats) < set(wide.qstats)
    restored = restore_checkpoint(ck, wide)
    for k, v in state.qstats.items():
        assert float(restored.qstats[k]) == pytest.approx(float(v))
    for k in set(wide.qstats) - set(state.qstats):
        assert float(restored.qstats[k]) == 0.0

    # and the reverse direction (wide checkpoint -> filtered run)
    wstep = make_train_step(cfg, aug_config_from(cfg))
    wide, _ = wstep(wide, im, ma, jax.random.PRNGKey(2))
    ck2 = str(tmp_path / "ck2")
    save_checkpoint(ck2, wide)
    _, narrow = _tiny(seed=4, min_channels=16)
    restored = restore_checkpoint(ck2, narrow)
    assert set(restored.qstats) == set(narrow.qstats)
    assert all(float(v) > 0 for v in restored.qstats.values())


def test_quantize_cli_zero_qstats_falls_back_to_calibration(tmp_path):
    """A --qat checkpoint whose ranges are all zero (no successful step)
    must make cli/quantize CALIBRATE instead of crashing on an empty
    amax dict."""
    from ddti_tpu.cli.quantize import main as quantize_main

    model, state = _tiny()  # qstats initialized to zeros, never stepped
    p = str(tmp_path / "w.npz")
    save_params_npz(p, jax.device_get(state.params),
                    jax.device_get(state.batch_stats),
                    qstats=jax.device_get(state.qstats))
    out = str(tmp_path / "q")
    rc = quantize_main(["--checkpoint", p, "--output", out,
                        "--model_type", "UNet", "--base_filters", "8",
                        "--depth", "3", "--image_size", "32",
                        "--batch_size", "2", "--calib_count", "4",
                        "--cpu", "--compilation_cache", "off"])
    assert rc == 0
    assert os.path.exists(out + "_serving_program.stablehlo")


def test_lr_finder_probes_fake_quant_under_qat(tmp_path):
    """--qat --lr_find: the disposable probe state carries the range
    tree, so the sweep measures the fake-quant loss landscape (and leaves
    the trainer's own ranges untouched)."""
    from ddti_tpu.core import create_logger
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.train import Trainer
    from ddti_tpu.train.lr_finder import run_lr_finder

    cfg = _tiny_cfg(epochs=1)
    cfg.base_dir = str(tmp_path)
    cfg.model_kwargs = dict(base_filters=8, depth=3)
    cfg.make_dirs()
    logger = create_logger(str(tmp_path / "log.log"))
    im, ma = _batch(n=8)
    src = DeviceDataSource(im, ma)
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, (src, src, src), logger, model)
    assert tr.state.qstats is not None
    r = run_lr_finder(tr, num_steps=10, min_lr=1e-5, max_lr=1e-1)
    assert r["lr_steepest"] > 0
    # trainer's own ranges are untouched (still the zeros init)
    assert all(float(v) == 0.0 for v in tr.state.qstats.values())

"""Training-engine integration tests: loss decreases, checkpoints round-trip,
early stopping, the Trainer end-to-end on synthetic data."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config, create_logger
from ddti_tpu.data import DeviceDataSource, generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import (
    Trainer,
    create_train_state,
    load_params_npz,
    make_eval_step,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    save_params_npz,
)
from ddti_tpu.train.engine import aug_config_from
from ddti_tpu.utils import EarlyStopping


def _tiny_cfg(tmp, **kw):
    base = dict(epochs=1, batch_size=4, image_size=32, store_size=32,
                lr=3e-3, model_type="UNet", base_dir=str(tmp))
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def tiny_data():
    im, ma = generate_ddti_like(8, (32, 32), 0)
    return jnp.asarray(im), jnp.asarray(ma)


def test_loss_decreases_over_steps(tmp_path, tiny_data):
    cfg = _tiny_cfg(tmp_path)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=100)
    step = make_train_step(cfg, aug_config_from(cfg))
    im, ma = tiny_data
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        key, k = jax.random.split(key)
        state, m = step(state, im[:4], ma[:4], k)
        losses.append(float(m.loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_eval_step_no_state_mutation(tmp_path, tiny_data):
    cfg = _tiny_cfg(tmp_path)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    estep = make_eval_step(cfg)
    im, ma = tiny_data
    m1 = estep(state, im[:4], ma[:4])
    m2 = estep(state, im[:4], ma[:4])
    assert float(m1.loss) == float(m2.loss)


def test_checkpoint_roundtrip_orbax(tmp_path, tiny_data):
    cfg = _tiny_cfg(tmp_path)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    im, ma = tiny_data
    step = make_train_step(cfg, aug_config_from(cfg))
    state, _ = step(state, im[:4], ma[:4], jax.random.PRNGKey(1))

    path = os.path.join(tmp_path, "ckpt")
    save_checkpoint(path, state)
    fresh = create_train_state(model, jax.random.PRNGKey(42), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (resume continues the schedule)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_save_checkpoint_overwrites_stale_tmp(tmp_path, tiny_data):
    """A stale ``<path>.orbax-checkpoint-tmp`` (a save interrupted by
    preemption, or the concurrent-save race the module lock now prevents)
    must not poison every later save of that path with EEXIST."""
    cfg = _tiny_cfg(tmp_path)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    path = os.path.join(tmp_path, "ckpt")
    # simulate stale dirs in BOTH naming conventions: the installed
    # orbax's actual suffix constant, and the timestamped variant newer
    # code paths write — save_checkpoint clears by glob (ADVICE r4)
    from orbax.checkpoint.path import atomicity

    suffix = atomicity.TMP_DIR_SUFFIX
    assert suffix.startswith(".orbax-checkpoint-tmp"), suffix
    os.makedirs(path + ".orbax-checkpoint-tmp")
    os.makedirs(path + ".orbax-checkpoint-tmp-1755700000000")
    save_checkpoint(path, state)
    fresh = create_train_state(model, jax.random.PRNGKey(42), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    restored = restore_checkpoint(path, fresh)
    assert int(restored.step) == int(state.step)
    assert not os.path.exists(path + ".orbax-checkpoint-tmp")
    assert not os.path.exists(path + ".orbax-checkpoint-tmp-1755700000000")


def test_load_checkpoint_into_orbax_dir(tmp_path, tiny_data):
    """The infer/quantize CLIs load weights-only from a FULL-state Orbax
    checkpoint (regression: a template with opt_state=None tripped
    Orbax's structure check, breaking `infer --checkpoint <orbax_dir>`)."""
    from ddti_tpu.train.checkpoint import load_checkpoint_into

    cfg = _tiny_cfg(tmp_path)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    path = os.path.join(tmp_path, "ckpt_full")
    save_checkpoint(path, state)

    tmpl = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(7)},
                           jnp.zeros((1, 32, 32, 1)), train=False))
    params, stats = load_checkpoint_into(path, "UNet", tmpl["params"],
                                         tmpl["batch_stats"])
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.batch_stats),
                    jax.tree.leaves(stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_weights_roundtrip(tmp_path):
    model = create_model("ResUNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    path = os.path.join(tmp_path, "w.npz")
    save_params_npz(path, v["params"], v["batch_stats"])
    zeros = jax.tree.map(jnp.zeros_like, v["params"])
    zstats = jax.tree.map(jnp.zeros_like, v["batch_stats"])
    params, stats = load_params_npz(path, zeros, zstats)
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping_patience():
    es = EarlyStopping(patience=3)
    es(-0.5)
    es(-0.6)  # improvement
    for _ in range(3):
        es(-0.4)
    assert es.early_stop


def test_early_stopping_resets_on_improvement():
    es = EarlyStopping(patience=3)
    es(-0.5)
    es(-0.4)
    es(-0.4)
    es(-0.6)  # improvement resets
    assert es.counter == 0 and not es.early_stop


def test_trainer_end_to_end(tmp_path):
    cfg = _tiny_cfg(tmp_path, epochs=2, use_mixup=True)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()
    # default best policy is weights-only (.npz; the Orbax full-state best
    # dir is opt-in via best_full_state); _last always carries full state
    assert os.path.isfile(os.path.join(cfg.model_dir, "UNet_best.npz"))
    assert not os.path.isdir(os.path.join(cfg.model_dir, "UNet_best"))
    assert os.path.isdir(os.path.join(cfg.model_dir, "UNet_last"))
    m = tr.test(visualize=True)
    assert 0.0 <= m["acc"] <= 1.0
    assert os.path.isfile(os.path.join(cfg.result_dir,
                                       "test_boundaries_0.png"))
    # per-image audit CSV: one deduped row per test image; counts sum to
    # the global (micro-averaged) totals
    import csv
    with open(os.path.join(cfg.result_dir, "per_image_metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 4
    assert sorted(int(r["index"]) for r in rows) == [0, 1, 2, 3]
    for key in ("tp", "fp", "fn", "tn"):
        assert sum(int(r[key]) for r in rows) == int(m[key])


def test_best_full_state_opt_in(tmp_path):
    """best_full_state=True restores the Orbax full-state best checkpoint
    (resume-from-best with optimizer state) alongside the .npz export."""
    cfg = _tiny_cfg(tmp_path, epochs=1, best_full_state=True)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()
    best = os.path.join(cfg.model_dir, "UNet_best")
    assert os.path.isdir(best)
    assert os.path.isfile(best + ".npz")
    # the full-state dir restores into a fresh state (optimizer included)
    from ddti_tpu.train.checkpoint import restore_checkpoint
    fresh = create_train_state(model, jax.random.PRNGKey(1), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=100)
    restored = restore_checkpoint(best, fresh)
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.state.params)),
                    jax.tree.leaves(jax.device_get(restored.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_reproduces_uninterrupted_run_exactly(tmp_path):
    """Full-state resume + stateless per-epoch rng streams: a run stopped
    after epoch 2 and resumed to epoch 4 ends with BIT-IDENTICAL params to
    the uninterrupted 4-epoch run — batch order and augmentation/mixup
    randomness are epoch-indexed, not a stateful chain that would restart
    from the seed on resume. (The reference cannot resume at all: its
    warm start reloads weights only, /root/reference/main.py:141-142.)"""
    def make(tag, epochs):
        cfg = _tiny_cfg(tmp_path / tag, epochs=epochs, use_mixup=True,
                        use_speckle=True)
        cfg.make_dirs()
        logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
        srcs = tuple(
            DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
            for n, s in ((12, 0), (4, 1), (4, 2)))
        model = create_model("UNet", base_filters=8, depth=3)
        return Trainer(cfg, srcs, logger, model), cfg

    straight, _ = make("straight", 4)
    straight.train()

    first, cfg1 = make("resumed", 2)
    first.train()
    last = os.path.join(cfg1.model_dir, "UNet_last")

    second, _ = make("resumed2", 4)
    from ddti_tpu.train.checkpoint import restore_checkpoint
    second.state = restore_checkpoint(last, second.state)
    second.start_epoch = min(int(second.state.step) // second.steps_per_epoch,
                             4)
    assert second.start_epoch == 2
    second.train()

    for a, b in zip(jax.tree.leaves(jax.device_get(straight.state.params)),
                    jax.tree.leaves(jax.device_get(second.state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
            jax.tree.leaves(jax.device_get(straight.state.batch_stats)),
            jax.tree.leaves(jax.device_get(second.state.batch_stats))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_iterator_set_epoch_is_resume_stable():
    """HostBatchIterator.set_epoch pins the stream to (seed, epoch): two
    iterations of the same epoch agree exactly (what a resumed run needs),
    different epochs differ, and the legacy stateful stream (no set_epoch)
    still advances between epochs."""
    from ddti_tpu.data import HostBatchIterator

    class _FakeDS:
        transform = None

        def __len__(self):
            return 12

        def open_pair(self, i):
            a = np.full((4, 4), i, np.uint8)
            return a, a

    def order(it):
        return [int(round(float(im[0, 0, 0, 0]) * 255)) for im, _ in it]

    it = HostBatchIterator(_FakeDS(), batch_size=1, shuffle=True, seed=3)
    it.set_epoch(5)
    first = order(it)
    it.set_epoch(5)
    assert order(it) == first
    it.set_epoch(6)
    assert order(it) != first

    stateful = HostBatchIterator(_FakeDS(), batch_size=1, shuffle=True,
                                 seed=3)
    assert order(stateful) != order(stateful)


def test_async_best_saver_latest_wins_and_survives_errors():
    """Unit: a failing write never raises into training; a payload
    superseded before writing is dropped; join() waits for the last one."""
    import logging

    from ddti_tpu.train.engine import _AsyncBestSaver

    saver = _AsyncBestSaver(logging.getLogger("t"))
    try:
        done = []
        saver.submit(lambda: 1 / 0, "boom")
        saver.join()  # error logged, thread alive
        import threading
        gate = threading.Event()
        saver.submit(lambda: gate.wait(5), "slow")
        # while "slow" may be pending or writing, queue two more: only the
        # newest of the queued ones must run
        saver.submit(lambda: done.append("a"), "a")
        saver.submit(lambda: done.append("b"), "b")
        gate.set()
        saver.join()
        assert done == ["b"]
    finally:
        saver.close()


def test_async_best_save_files_on_disk_after_train(tmp_path):
    """Default async best-saves: train() joins the writer, so the best
    artifacts are complete on disk when train() returns, and the saver
    thread is shut down."""
    cfg = _tiny_cfg(tmp_path, epochs=2)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    assert cfg.async_best_save  # the default path under test
    tr.train()
    assert tr._best_saver is None  # closed by train()
    best = os.path.join(cfg.model_dir, "UNet_best.npz")
    assert os.path.isfile(best)
    assert not os.path.exists(best.replace(".npz", ".tmp.npz"))
    # the bundle is complete and loadable
    from ddti_tpu.train.checkpoint import load_params_npz
    p, s = load_params_npz(best, tr.state.params, tr.state.batch_stats)
    assert jax.tree.structure(p) == jax.tree.structure(tr.state.params)


def test_test_metrics_dedupe_wraparound_padding(tmp_path):
    """Non-divisible test sets: the final batch is wraparound-padded for
    static shapes, but the global metrics must count each image exactly
    once (the reference iterates the set unpadded)."""
    cfg = _tiny_cfg(tmp_path, epochs=1)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    # test split n=6 with batch 4 -> batches [4, 2+2 wrap-pad]
    srcs = (DeviceDataSource(*generate_ddti_like(8, (32, 32), 0)),
            DeviceDataSource(*generate_ddti_like(4, (32, 32), 1)),
            DeviceDataSource(*generate_ddti_like(6, (32, 32), 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    m = tr.test(visualize=False)

    logits = model.apply({"params": tr.state.params,
                          "batch_stats": tr.state.batch_stats},
                         np.asarray(srcs[2].images, np.float32) / 255.0,
                         train=False)
    pred = 1 / (1 + np.exp(-np.asarray(logits, np.float32))) > 0.5
    t_int = (np.asarray(srcs[2].masks, np.float32) / 255.0).astype(int)
    assert int(m["tp"]) == np.logical_and(pred, t_int == 1).sum()
    assert int(m["fp"]) == np.logical_and(pred, t_int == 0).sum()
    assert int(m["fn"]) == np.logical_and(~pred, t_int == 1).sum()
    assert int(m["tn"]) == np.logical_and(~pred, t_int == 0).sum()

    import csv
    with open(os.path.join(cfg.result_dir, "per_image_metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6


def test_val_metrics_dedupe_wraparound_padding(tmp_path):
    """validate() must count each val image exactly once despite the
    wraparound-padded final batch (QUIRKS #22)."""
    cfg = _tiny_cfg(tmp_path, epochs=1)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = (DeviceDataSource(*generate_ddti_like(8, (32, 32), 0)),
            DeviceDataSource(*generate_ddti_like(6, (32, 32), 1)),
            DeviceDataSource(*generate_ddti_like(4, (32, 32), 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    _, val_iou = tr.validate(0)

    logits = model.apply({"params": tr.state.params,
                          "batch_stats": tr.state.batch_stats},
                         np.asarray(srcs[1].images, np.float32) / 255.0,
                         train=False)
    pred = 1 / (1 + np.exp(-np.asarray(logits, np.float32))) > 0.5
    t_bool = (np.asarray(srcs[1].masks, np.float32) / 255.0) > 0
    want = (np.logical_and(pred, t_bool).sum()
            / np.logical_or(pred, t_bool).sum())
    assert val_iou == pytest.approx(float(want), abs=1e-6)


def test_trainer_boundary_loss_path(tmp_path):
    # boundary_ratio > 0 exercises the on-device EDT inside the jitted step
    cfg = _tiny_cfg(tmp_path, boundary_ratio=0.5)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    im, ma = generate_ddti_like(4, (32, 32), 5)
    step = make_train_step(cfg, aug_config_from(cfg))
    state, m = step(state, jnp.asarray(im), jnp.asarray(ma),
                    jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss)) and float(m.boundary) > 0


@pytest.mark.slow
def test_fused_epoch_matches_stepwise(tmp_path):
    """fused_epoch (whole epoch as one scanned program) must produce the
    same final params as the step-by-step path given identical rng."""
    import os

    from ddti_tpu.core import create_logger
    from ddti_tpu.data import DeviceDataSource

    def run(fused):
        cfg = _tiny_cfg(tmp_path, epochs=1, fused_epoch=fused,
                        base_dir=str(tmp_path / f"f{fused}"))
        cfg.make_dirs()
        logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
        srcs = tuple(
            DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
            for n, s in ((8, 0), (4, 1), (4, 2)))
        model = create_model("UNet", base_filters=8, depth=3)
        tr = Trainer(cfg, srcs, logger, model)
        tr.train_one_epoch(0)
        return jax.device_get(tr.state)

    s1 = run(False)
    s2 = run(True)
    assert int(s1.step) == int(s2.step)
    # scan vs straight-line compilation reassociates float reductions;
    # AdamW's first-step normalization can amplify a near-zero gradient's
    # rounding noise to a full +-lr update on isolated elements. Require
    # near-exact agreement on >=98% of elements and bound the rest by the
    # Adam step size.
    lr = 3e-3
    total = close = 0
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=2.5 * lr)
        close += int(np.isclose(a, b, rtol=1e-4, atol=1e-6).sum())
        total += a.size
    assert close / total >= 0.98


def test_decode_to_store_cache_roundtrip(tmp_path):
    from ddti_tpu.data import MedicalDataset, decode_to_store
    from ddti_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=4, n_val=1, n_test=1,
                            size=(32, 32))
    ds = MedicalDataset(os.path.join(root, "train"),
                        os.path.join(root, "train_mask"))
    cache = str(tmp_path / "cache")
    a_i, a_m = decode_to_store(ds, (32, 32), cache_dir=cache)
    b_i, b_m = decode_to_store(ds, (32, 32), cache_dir=cache)  # from cache
    np.testing.assert_array_equal(a_i, b_i)
    np.testing.assert_array_equal(a_m, b_m)
    assert len(os.listdir(cache)) == 2


@pytest.mark.slow
def test_deep_supervision_training(tmp_path):
    """ImprovedVNet with deep_supervision trains: aux heads contribute to
    the loss (alpha > 0) and gradients stay finite."""
    cfg = _tiny_cfg(tmp_path, alpha=0.5)
    model = create_model("ImprovedVNet", base_filters=8, depth=3,
                         deep_supervision=True)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    im, ma = generate_ddti_like(4, (32, 32), 7)
    step = make_train_step(cfg, aug_config_from(cfg))
    state, m = step(state, jnp.asarray(im), jnp.asarray(ma),
                    jax.random.PRNGKey(1))
    loss_with_ds = float(m.loss)
    assert np.isfinite(loss_with_ds)

    cfg0 = _tiny_cfg(tmp_path, alpha=0.0)
    state0 = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                                cfg0.lr, steps_per_epoch=10)
    step0 = make_train_step(cfg0, aug_config_from(cfg0))
    _, m0 = step0(state0, jnp.asarray(im), jnp.asarray(ma),
                  jax.random.PRNGKey(1))
    # ds-aux term adds to the total
    assert loss_with_ds > float(m0.loss)


@pytest.mark.slow
def test_trainer_exports_reference_pth(tmp_path):
    """Training output includes a reference-format .pth the torch reference
    can load_state_dict."""
    pytest.importorskip("torch")
    cfg = _tiny_cfg(tmp_path, epochs=1, model_type="ResUNet")
    cfg.model_kwargs = dict(base_filters=8, depth=3)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("ResUNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()
    pth = os.path.join(cfg.model_dir, "ResUNet_best.pth")
    assert os.path.isfile(pth)
    # roundtrip through our own importer validates the key layout
    from ddti_tpu.train.torch_interop import import_state_dict, load_pth
    sd = load_pth(pth)
    p, s = import_state_dict("ResUNet", sd, tr.state.params,
                             tr.state.batch_stats)
    for a, b in zip(jax.tree.leaves(jax.device_get(tr.state.params)),
                    jax.tree.leaves(p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_serving_export_roundtrip(tmp_path):
    """StableHLO serving artifact: serialize, reload, outputs match the
    live model exactly."""
    from ddti_tpu.train.export import (
        load_serving_file,
        make_serve_fn,
        save_serving,
    )

    model = create_model("ResUNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    path = os.path.join(tmp_path, "serve.stablehlo")
    save_serving(path, model, v["params"], v["batch_stats"], batch=2,
                 size=32)
    assert os.path.getsize(path) > 1000

    fn = load_serving_file(path)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
    got = np.asarray(fn(x))
    want = np.asarray(make_serve_fn(model, v["params"],
                                    v["batch_stats"])(x))
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.uint8


@pytest.mark.slow
def test_trainer_export_serving_artifact(tmp_path):
    """cfg.export_serving writes a StableHLO artifact at end of training
    that loads and predicts without the model code (train/export.py)."""
    cfg = _tiny_cfg(tmp_path, epochs=1, export_serving=True, batch_size=4)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()
    path = os.path.join(cfg.model_dir, "UNet_serving.stablehlo")
    assert os.path.isfile(path)
    from ddti_tpu.train.export import load_serving_file
    fn = load_serving_file(path)
    x = np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 1)).astype(
        np.float32)
    out = np.asarray(fn(x))
    assert out.shape == (4, 32, 32, 1) and out.dtype == np.uint8


@pytest.mark.slow
def test_profile_steps_writes_trace(tmp_path):
    """--profile N captures an XLA device trace of the first N train steps
    into <result_dir>/trace (engine.train_one_epoch; core/profiling.py).
    The reference has no profiler at all (SURVEY.md section 5)."""
    from ddti_tpu.core import create_logger
    from ddti_tpu.train.engine import Trainer

    cfg = _tiny_cfg(tmp_path, profile_steps=2, use_data_parallel=False)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(DeviceDataSource(*generate_ddti_like(8, (32, 32), s))
                 for s in (0, 1, 2))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train_one_epoch(0)
    trace_dir = os.path.join(cfg.result_dir, "trace")
    hits = [os.path.join(r, f) for r, _, fs in os.walk(trace_dir)
            for f in fs if f.endswith((".xplane.pb", ".trace.json.gz"))]
    assert hits, f"no trace artifacts under {trace_dir}"
    # epoch 2 must not try to trace again (start_trace would raise)
    tr.train_one_epoch(1)


@pytest.mark.slow
def test_trainer_export_serving_int8(tmp_path):
    """--serving_dtype int8: end of training writes an int8-quantized
    weights-as-arguments bundle (calibrated on a val batch) that
    load_serving_bundle serves from directly (train/quantize.py)."""
    cfg = _tiny_cfg(tmp_path, epochs=1, export_serving=True, batch_size=4,
                    serving_dtype="int8")
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()
    ppath = os.path.join(cfg.model_dir, "UNet_serving_program.stablehlo")
    assert os.path.isfile(ppath) and os.path.isfile(
        ppath[: -len(".stablehlo")] + ".npz")
    import numpy as _np

    npz = _np.load(ppath[: -len(".stablehlo")] + ".npz")
    assert any(k.startswith("quant/") for k in npz.files), npz.files[:5]
    from ddti_tpu.train.export import load_serving_bundle
    fn, batch, size, dt = load_serving_bundle(ppath)
    assert (batch, size) == (4, 32) and dt == jnp.float32
    x = _np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 1)).astype(
        _np.float32)
    out = _np.asarray(fn(jnp.asarray(x)))
    assert out.shape == (4, 32, 32, 1) and out.dtype == _np.uint8


@pytest.mark.slow
def test_serving_aot_uint8_artifact():
    """The deployment artifact bench.py measures: uint8-in (conversion
    baked in), BN folded, deserialized + AOT-compiled to a loaded
    executable; output matches the live serve path."""
    from ddti_tpu.train.export import (
        aot_compile_serving,
        export_serving,
        make_serve_fn,
    )

    model = create_model("ResUNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    blob = export_serving(model, v["params"], v["batch_stats"], batch=2,
                          size=32, fold_bn=True, input_dtype=jnp.uint8)
    exe = aot_compile_serving(blob)
    x = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 1)).astype(
        np.uint8)
    got = np.asarray(exe(x))
    # weights-as-arguments form (the flagship-scale deployment split)
    from ddti_tpu.train.export import export_serving_program
    blob2, variables = export_serving_program(
        model, v["params"], v["batch_stats"], batch=2, size=32,
        fold_bn=True, input_dtype=jnp.uint8)
    exe2 = aot_compile_serving(blob2)
    got2 = np.asarray(exe2(variables, x))
    np.testing.assert_array_equal(got2, got)
    assert got.dtype == np.uint8 and got.shape == (2, 32, 32, 1)
    live = np.asarray(make_serve_fn(model, v["params"],
                                    v["batch_stats"])(jnp.asarray(x)))
    # BN folding shifts logits ~1e-3 under MXU default precision; allow a
    # handful of threshold-boundary pixels to flip
    assert (got != live).mean() < 0.01


@pytest.mark.slow
def test_serving_export_bf16_weights():
    """weights_dtype=bf16 halves the deployment bundle; predictions must
    agree with the f32-weights artifact on all but threshold-boundary
    pixels (weights are bf16 in the conv fusions either way)."""
    from ddti_tpu.train.export import (
        aot_compile_serving,
        export_serving_program,
    )

    model = create_model("ResUNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    x = np.random.default_rng(0).integers(0, 256, (2, 32, 32, 1)).astype(
        np.uint8)
    outs, nbytes = [], []
    for wd in (None, jnp.bfloat16):
        blob, variables = export_serving_program(
            model, v["params"], v["batch_stats"], batch=2, size=32,
            fold_bn=True, input_dtype=jnp.uint8, weights_dtype=wd)
        outs.append(np.asarray(aot_compile_serving(blob)(variables, x)))
        nbytes.append(sum(np.asarray(a).nbytes
                          for a in jax.tree.leaves(variables)))
    assert nbytes[1] < 0.6 * nbytes[0]
    assert (outs[0] != outs[1]).mean() < 0.01


def test_step_progress_and_tb_scalars(tmp_path):
    """(a) tqdm-equivalent per-step progress lines reach the log; (b) all
    9 TensorBoard scalars per phase actually land in the event file
    (reference writes them at trainer.py:111-119,162-170)."""
    import glob

    cfg = _tiny_cfg(tmp_path, epochs=1, batch_size=4, log_every=1)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train_one_epoch(0)
    tr.validate(0)
    tr.writer.close()

    log = open(os.path.join(cfg.log_dir, "train_log.log")).read()
    assert "Epoch 1 step 1: loss" in log and "img/s" in log

    events = glob.glob(os.path.join(cfg.result_dir, "events.out.tfevents*"))
    assert events, "no TB event file written"
    raw = b"".join(open(p, "rb").read() for p in events)
    for tag in ("BCE Loss", "Dice Loss", "Focal Loss", "Boundary Loss",
                "Acc", "Precision", "Recall", "F1", "IoU"):
        for phase in ("Train", "Validate"):
            # tensorboardX sanitizes spaces in tags to underscores
            t = f"{tag}/{phase}".replace(" ", "_").encode()
            assert t in raw, f"{tag}/{phase} missing"


@pytest.mark.slow
def test_grad_accum_matches_manual_microbatching(tmp_path, tiny_data):
    """grad_accum=K must equal the hand-rolled accumulation semantics:
    augment/mixup the FULL batch, then per microbatch value_and_grad with
    chained BatchNorm stats, mean gradient, one optimizer update."""
    from ddti_tpu.data.augment import augment_batch, mixup
    from ddti_tpu.losses import weighted_loss

    # exact warp pinned: this oracle compares params AFTER an AdamW step,
    # whose normalized first update amplifies ulp-level jit-vs-eager grad
    # noise on tiny-|g| params (lr/|g|); the integer-index exact warp keeps
    # that noise under the tolerance, while the Paeth default's different
    # fusion layout reshuffles it past atol (3.3e-4 vs 7.7e-5 measured,
    # r5) — a test-conditioning artifact, not a grad_accum defect.
    cfg = _tiny_cfg(tmp_path, use_mixup=True, grad_accum=2,
                    aug_fast_warp=False)
    aug = aug_config_from(cfg)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    ref_state = jax.tree.map(jnp.copy, state)  # the step donates its arg

    im, ma = tiny_data
    key = jax.random.PRNGKey(7)
    step = make_train_step(cfg, aug_config_from(cfg))
    new_state, m = step(state, im[:4], ma[:4], key)

    # --- manual oracle (same key derivation as the step) ---
    images = im[:4].astype(jnp.float32) / 255.0
    masks = ma[:4].astype(jnp.float32) / 255.0
    k_aug, k_mix, k_drop = jax.random.split(key, 3)
    images, masks = augment_batch(k_aug, images, masks, aug)
    images, masks = mixup(k_mix, images, masks, cfg.mixup_alpha,
                          cfg.mixup_prob)
    loss_kw = dict(bce_ratio=cfg.bce_ratio, dice_ratio=cfg.dice_ratio,
                   focal_ratio=cfg.focal_ratio,
                   boundary_ratio=cfg.boundary_ratio,
                   compute_unused=cfg.compute_unused_losses)
    bstats = ref_state.batch_stats
    gsum = jax.tree.map(jnp.zeros_like, ref_state.params)
    losses = []
    for i in range(2):
        xi, mi = images[2 * i:2 * i + 2], masks[2 * i:2 * i + 2]
        ki = jax.random.fold_in(k_drop, i)

        def loss_fn(p, bs):
            out, upd = ref_state.apply_fn(
                {"params": p, "batch_stats": bs}, xi, train=True,
                mutable=["batch_stats"], rngs={"dropout": ki})
            return weighted_loss(out, mi, **loss_kw).total, upd
        (loss, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(
            ref_state.params, bstats)
        bstats = upd["batch_stats"]
        gsum = jax.tree.map(jnp.add, gsum, g)
        losses.append(float(loss))
    grads = jax.tree.map(lambda x: x / 2.0, gsum)
    expect = ref_state.apply_gradients(grads, bstats)

    # f32 jit-vs-eager reassociation noise is ~1e-5; a wrong implementation
    # (missing 1/K, unchained BN stats, wrong keys) is O(1) relative.
    np.testing.assert_allclose(float(m.loss), np.mean(losses), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(expect.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(new_state.batch_stats),
                    jax.tree.leaves(expect.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-4)


@pytest.mark.slow
def test_grad_accum_trainer_end_to_end(tmp_path):
    """Trainer runs with --grad_accum 2: losses finite, params update."""
    cfg = _tiny_cfg(tmp_path, epochs=2, batch_size=4, grad_accum=2)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((8, 0), (4, 1), (4, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model)
    tr.train()
    assert np.isfinite(tr.best_val_iou)


def test_grad_accum_indivisible_batch_raises(tmp_path, tiny_data):
    cfg = _tiny_cfg(tmp_path, grad_accum=3)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    im, ma = tiny_data
    step = make_train_step(cfg, aug_config_from(cfg))
    with pytest.raises(ValueError, match="not divisible"):
        step(state, im[:4], ma[:4], jax.random.PRNGKey(1))


@pytest.mark.slow
def test_fused_epoch_with_grad_accum(tmp_path):
    """fused_epoch x grad_accum: the accumulation scan nests inside the
    epoch scan; same final params as the stepwise grad_accum path."""
    from ddti_tpu.core import create_logger
    from ddti_tpu.data import DeviceDataSource

    def run(fused):
        cfg = _tiny_cfg(tmp_path, epochs=1, fused_epoch=fused, grad_accum=2,
                        base_dir=str(tmp_path / f"ga_f{fused}"))
        cfg.make_dirs()
        logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
        srcs = tuple(
            DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
            for n, s in ((8, 0), (4, 1), (4, 2)))
        model = create_model("UNet", base_filters=8, depth=3)
        tr = Trainer(cfg, srcs, logger, model)
        tr.train_one_epoch(0)
        return jax.device_get(tr.state)

    s1 = run(False)
    s2 = run(True)
    assert int(s1.step) == int(s2.step)
    lr = 3e-3
    total = close = 0
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=2.5 * lr)
        close += int(np.isclose(a, b, rtol=1e-4, atol=1e-6).sum())
        total += a.size
    assert close / total >= 0.98

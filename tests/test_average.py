"""Checkpoint averaging CLI (cli/average.py): exact weighted means,
managed-root expansion, BN recalibration, and warm-starting the train
CLI from the averaged .npz bundle."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddti_tpu.cli.average import _expand_managed, main as average_main
from ddti_tpu.models import create_model
from ddti_tpu.train.checkpoint import load_params_npz, save_params_npz
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"

MODEL_ARGS = ["--model_type", "UNet", "--base_filters", "8",
              "--depth", "2", "--image_size", "32", "--cpu",
              "--compilation_cache", "off"]


def _init_vars(seed):
    model = create_model("UNet", in_channels=1, out_channels=1,
                         base_filters=8, depth=2)
    v = model.init({"params": jax.random.PRNGKey(seed)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    return model, v["params"], v.get("batch_stats", {})


def _write_npz(path, seed):
    _, p, s = _init_vars(seed)
    save_params_npz(path, p, s)
    return p, s


def test_average_uniform_and_weighted(tmp_path):
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    pa, sa = _write_npz(a, 0)
    pb, sb = _write_npz(b, 1)
    out = str(tmp_path / "avg.npz")
    assert average_main(["--checkpoints", a, b, "--output", out]
                        + MODEL_ARGS) == 0
    _, tp, ts = _init_vars(2)
    p, s = load_params_npz(out, tp, ts)
    jax.tree.map(
        lambda x, ya, yb: np.testing.assert_allclose(
            x, (np.asarray(ya, np.float64) + np.asarray(yb)) / 2,
            rtol=1e-6),
        p, pa, pb)

    out2 = str(tmp_path / "avg_w.npz")
    assert average_main(["--checkpoints", a, b, "--output", out2,
                         "--weights", "3,1"] + MODEL_ARGS) == 0
    p2, _ = load_params_npz(out2, tp, ts)
    jax.tree.map(
        lambda x, ya, yb: np.testing.assert_allclose(
            x, 0.75 * np.asarray(ya, np.float64) + 0.25 * np.asarray(yb),
            rtol=1e-6),
        p2, pa, pb)


def test_average_rejects_single_and_bad_weights(tmp_path):
    a = str(tmp_path / "a.npz")
    _write_npz(a, 0)
    out = str(tmp_path / "o.npz")
    assert average_main(["--checkpoints", a, "--output", out]
                        + MODEL_ARGS) == 1
    b = str(tmp_path / "b.npz")
    _write_npz(b, 1)
    assert average_main(["--checkpoints", a, b, "--output", out,
                         "--weights", "1,2,3"] + MODEL_ARGS) == 1


def test_managed_root_expansion_and_average(tmp_path):
    from ddti_tpu.train.checkpoint import ManagedCheckpointer
    from ddti_tpu.train.state import create_train_state

    model, _, _ = _init_vars(0)
    root = str(tmp_path / "managed")
    mgr = ManagedCheckpointer(root, max_to_keep=3, async_save=False)
    states = []
    for step in (1, 2):
        st = create_train_state(model, jax.random.PRNGKey(step),
                                (1, 32, 32, 1), 1e-3, steps_per_epoch=10)
        mgr.save(step, st)
        states.append(st)
    mgr.close()

    paths = _expand_managed(root)
    assert len(paths) == 2

    out = str(tmp_path / "avg.npz")
    assert average_main(["--checkpoints", root, "--output", out]
                        + MODEL_ARGS) == 0
    _, tp, ts = _init_vars(9)
    p, _ = load_params_npz(out, tp, ts)
    jax.tree.map(
        lambda x, ya, yb: np.testing.assert_allclose(
            x, (np.asarray(ya, np.float64) + np.asarray(yb)) / 2,
            rtol=1e-5, atol=1e-7),
        p, states[0].params, states[1].params)


def test_bn_recalibration_moves_stats(tmp_path):
    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    _write_npz(a, 0)
    _write_npz(b, 1)
    out = str(tmp_path / "avg.npz")
    out_rc = str(tmp_path / "avg_rc.npz")
    assert average_main(["--checkpoints", a, b, "--output", out]
                        + MODEL_ARGS) == 0
    assert average_main(["--checkpoints", a, b, "--output", out_rc,
                         "--recalib_count", "8", "--recalib_batch", "8",
                         "--recalib_passes", "30"] + MODEL_ARGS) == 0
    _, tp, ts = _init_vars(2)
    p0, s0 = load_params_npz(out, tp, ts)
    p1, s1 = load_params_npz(out_rc, tp, ts)
    # params identical; stats re-estimated (changed, finite)
    jax.tree.map(lambda x, y: np.testing.assert_array_equal(
        np.asarray(x), np.asarray(y)), p0, p1)
    changed = jax.tree.map(
        lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
        s0, s1)
    assert max(jax.tree.leaves(changed)) > 1e-6
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(s1))


def test_train_cli_warm_starts_from_average(tmp_path):
    from ddti_tpu.cli.main import main

    a = str(tmp_path / "a.npz")
    b = str(tmp_path / "b.npz")
    _write_npz(a, 0)
    _write_npz(b, 1)
    out = str(tmp_path / "avg.npz")
    assert average_main(["--checkpoints", a, b, "--output", out]
                        + MODEL_ARGS) == 0
    rc = main(["--mode", "train", "--synthetic", "--epochs", "1",
               "--image_size", "32", "--store_size", "32",
               "--model_type", "UNet", "--base_filters", "8",
               "--depth", "2", "--batch_size", "8", "--lr", "1e-3",
               "--checkpoint_path", out, "--base_dir",
               str(tmp_path / "runs")])
    assert rc == 0
    run_root = tmp_path / "runs"
    log = (run_root / os.listdir(run_root)[0] / "log"
           / "train_log.log").read_text()
    assert f"Warm-started weights from {out}" in log
    # --resume from a weights-only bundle must refuse, not silently
    # drop the optimizer state
    with pytest.raises(ValueError):
        main(["--mode", "train", "--synthetic", "--epochs", "1",
              "--image_size", "32", "--store_size", "32",
              "--model_type", "UNet", "--base_filters", "8",
              "--depth", "2", "--batch_size", "8", "--resume",
              "--checkpoint_path", out, "--base_dir",
              str(tmp_path / "runs2")])


def test_average_max_merges_qat_ranges(tmp_path):
    """Averaging --qat checkpoints: activation ranges merge by MAX (the
    saturation-safe choice) and ride the output .npz into int8 exports."""
    import jax
    import numpy as np

    from ddti_tpu.cli.average import main as avg_main
    from ddti_tpu.models import create_model
    from ddti_tpu.train import create_train_state
    from ddti_tpu.train.checkpoint import load_qstats, save_params_npz

    model = create_model("UNet", base_filters=8, depth=3)
    cks = []
    for seed, scale in ((0, 1.0), (1, 3.0)):
        state = create_train_state(model, jax.random.PRNGKey(seed),
                                   (1, 32, 32, 1), 1e-3,
                                   steps_per_epoch=10, qat=True)
        qs = {k: np.float32(scale * (i + 1)) for i, k in
              enumerate(sorted(state.qstats))}
        p = str(tmp_path / f"m{seed}.npz")
        save_params_npz(p, jax.device_get(state.params),
                        jax.device_get(state.batch_stats), qstats=qs)
        cks.append((p, qs))

    out = str(tmp_path / "avg.npz")
    rc = avg_main(["--checkpoints", *[p for p, _ in cks],
                   "--output", out, "--model_type", "UNet",
                   "--base_filters", "8", "--depth", "3",
                   "--image_size", "32", "--recalib_count", "0"])
    assert rc == 0
    merged = load_qstats(out)
    assert merged
    for k in merged:
        assert merged[k] == max(cks[0][1][k], cks[1][1][k])

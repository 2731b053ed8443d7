"""Metric parity: device confusion counts vs the reference's numpy formulas
under BOTH target-binarization conventions, and the schedule vs torch."""

import numpy as np
import pytest

import jax.numpy as jnp

from ddti_tpu.eval.metrics import (
    calculate_acc,
    calculate_iou,
    calculate_precision_recall_f1,
    confusion_counts,
    epoch_metrics_from_counts,
    metrics_from_counts,
)


@pytest.fixture(scope="module")
def soft_case():
    rng = np.random.default_rng(2)
    logits = (rng.normal(size=(2, 16, 16, 1)) * 4).astype(np.float32)
    # soft targets like bilinear-resized masks: values in {0, 0.25, .5, 1}
    targets = rng.choice([0.0, 0.25, 0.5, 1.0], (2, 16, 16, 1),
                         p=[0.6, 0.1, 0.1, 0.2]).astype(np.float32)
    return logits, targets


def test_counts_match_numpy_conventions(soft_case):
    logits, targets = soft_case
    pred = (1 / (1 + np.exp(-logits)) > 0.5)
    c = confusion_counts(jnp.asarray(logits), jnp.asarray(targets))
    # int truncation convention
    t_int = targets.astype(int)
    assert float(c.tp) == np.logical_and(pred, t_int == 1).sum()
    assert float(c.fp) == np.logical_and(pred, t_int == 0).sum()
    assert float(c.fn) == np.logical_and(~pred, t_int == 1).sum()
    assert float(c.tn) == np.logical_and(~pred, t_int == 0).sum()
    # bool convention (reference epoch IoU)
    t_bool = targets.astype(bool)
    assert float(c.inter) == np.logical_and(pred, t_bool).sum()
    assert float(c.union) == np.logical_or(pred, t_bool).sum()


def test_per_image_counts_sum_to_global(soft_case):
    logits, targets = soft_case
    c = confusion_counts(jnp.asarray(logits), jnp.asarray(targets))
    p = confusion_counts(jnp.asarray(logits), jnp.asarray(targets),
                         per_image=True)
    assert p.tp.shape == (2,)
    for g, v in zip(c, p):
        assert float(g) == float(v.sum())
    # each row matches the numpy computation restricted to that image
    pred = (1 / (1 + np.exp(-logits)) > 0.5)
    t_bool = targets.astype(bool)
    for j in range(2):
        assert float(p.inter[j]) == np.logical_and(pred[j], t_bool[j]).sum()
        assert float(p.union[j]) == np.logical_or(pred[j], t_bool[j]).sum()


def test_epoch_metrics_match_reference_functions(soft_case):
    logits, targets = soft_case
    pred = (1 / (1 + np.exp(-logits)) > 0.5)
    c = confusion_counts(jnp.asarray(logits), jnp.asarray(targets))
    em = epoch_metrics_from_counts(c)
    assert em["acc"] == pytest.approx(calculate_acc(pred, targets))
    p, r, f1 = calculate_precision_recall_f1(pred, targets)
    assert em["precision"] == pytest.approx(p)
    assert em["recall"] == pytest.approx(r)
    assert em["f1"] == pytest.approx(f1)
    assert em["iou"] == pytest.approx(calculate_iou(pred, targets))


def test_test_metrics_formulas():
    m = metrics_from_counts(10, 5, 5, 80)
    assert m["acc"] == pytest.approx(90 / 100, rel=1e-6)
    assert m["precision"] == pytest.approx(10 / 15, rel=1e-6)
    assert m["recall"] == pytest.approx(10 / 15, rel=1e-6)
    assert m["iou"] == pytest.approx(10 / 20, rel=1e-6)


def test_counts_accumulate():
    a = confusion_counts(jnp.ones((1, 4, 4, 1)), jnp.ones((1, 4, 4, 1)))
    b = confusion_counts(-jnp.ones((1, 4, 4, 1)), jnp.zeros((1, 4, 4, 1)))
    s = a + b
    assert float(s.tp) == 16 and float(s.tn) == 16


def test_cosine_warm_restarts_matches_torch():
    torch = pytest.importorskip("torch")
    from ddti_tpu.train.schedule import cosine_warm_restarts

    base_lr = 1e-3
    sched = cosine_warm_restarts(base_lr, steps_per_epoch=1, t_0=20,
                                 t_mult=2, eta_min=0.0)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=20, T_mult=2, eta_min=0)
    for epoch in range(140):
        want = opt.param_groups[0]["lr"]
        got = float(sched(epoch))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-8), f"epoch {epoch}"
        tsched.step()


def test_cosine_warm_restarts_tmult1():
    torch = pytest.importorskip("torch")
    from ddti_tpu.train.schedule import cosine_warm_restarts

    sched = cosine_warm_restarts(0.01, steps_per_epoch=1, t_0=10, t_mult=1)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=0.01)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=1, eta_min=0)
    for epoch in range(35):
        assert float(sched(epoch)) == pytest.approx(
            opt.param_groups[0]["lr"], rel=1e-5, abs=1e-8)
        tsched.step()


def test_weight_init_reinitializes_kernels():
    import jax
    from ddti_tpu.models import create_model
    from ddti_tpu.utils.weight_init import apply_init

    m = create_model("UNet", base_filters=8, depth=3)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 16, 16, 1)), train=False)
    p2 = apply_init(jax.random.PRNGKey(1), v["params"])
    leaves1 = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    leaves2 = jax.tree.leaves(p2)
    changed = unchanged = 0
    for (kp, a), b in zip(leaves1, leaves2):
        name = str(getattr(kp[-1], "key", kp[-1]))
        if name == "kernel":
            changed += int(not np.allclose(np.asarray(a), np.asarray(b)))
        else:
            unchanged += int(np.allclose(np.asarray(a), np.asarray(b)))
    assert changed > 0 and unchanged > 0


def test_confusion_matrix_plot(tmp_path):
    from ddti_tpu.eval import save_confusion_matrix

    path = save_confusion_matrix(10, 5, 3, 100, str(tmp_path), epoch=0)
    import os
    assert os.path.isfile(path)


def test_profiler_trace_writes_files(tmp_path):
    import jax

    from ddti_tpu.core.profiling import annotate, device_memory_stats, trace

    with trace(str(tmp_path)):
        with annotate("unit-test-region"):
            jax.jit(lambda x: x * 2)(jnp.ones((8, 8))).block_until_ready()
    import os
    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found  # trace events written
    stats = device_memory_stats()
    assert isinstance(stats, dict) and stats

"""Loss parity tests against independently-written torch/scipy oracles of
the reference formulas (/root/reference/models/loss.py)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from ddti_tpu import losses as L  # noqa: E402


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(1)
    logits = (rng.normal(size=(3, 24, 24, 1)) * 3).astype(np.float32)
    targets = (rng.random((3, 24, 24, 1)) > 0.7).astype(np.float32)
    return jnp.asarray(logits), jnp.asarray(targets), logits, targets


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_dice_vs_numpy_oracle(batch):
    jl, jt, logits, targets = batch
    p = _sigmoid(logits).reshape(3, -1)
    t = targets.reshape(3, -1)
    dice = (2 * (p * t).sum(1) + 1.0) / (p.sum(1) + t.sum(1) + 1.0)
    want = 1 - dice.mean()
    assert float(L.dice_loss(jl, jt)) == pytest.approx(want, rel=1e-5)


def test_bce_vs_numpy_oracle(batch):
    jl, jt, logits, targets = batch
    p = np.clip(_sigmoid(logits), 1e-7, 1 - 1e-7)
    want = -(targets * np.log(p) + (1 - targets) * np.log(1 - p)).mean()
    assert float(L.bce_with_logits_loss(jl, jt)) == pytest.approx(
        want, rel=1e-4)


def test_focal_tversky_vs_numpy_oracle(batch):
    jl, jt, logits, targets = batch
    p = _sigmoid(logits).reshape(-1)
    t = targets.reshape(-1)
    tp, fp, fn = (p * t).sum(), (p * (1 - t)).sum(), ((1 - p) * t).sum()
    ti = (tp + 1e-6) / (tp + 0.4 * fp + 0.6 * fn + 1e-6)
    want = (1 - ti) ** 2.0
    assert float(L.focal_tversky_loss(jl, jt)) == pytest.approx(
        want, rel=1e-5)


def test_boundary_vs_scipy_oracle(batch):
    nd = pytest.importorskip("scipy.ndimage")
    jl, jt, logits, targets = batch
    p = _sigmoid(logits)
    acc = 0.0
    for b in range(3):
        dt = nd.distance_transform_edt(1 - targets[b, :, :, 0].astype(np.uint8))
        acc += (np.abs(p[b, :, :, 0] - targets[b, :, :, 0]) * dt).mean()
    want = acc / 3
    assert float(L.boundary_loss(jl, jt)) == pytest.approx(want, rel=1e-4)


def test_weighted_loss_terms(batch):
    jl, jt, *_ = batch
    terms = L.weighted_loss(jl, jt, bce_ratio=1.0, dice_ratio=0.5,
                            focal_ratio=1.0, boundary_ratio=0.25)
    want = (float(terms.bce) + 0.5 * float(terms.dice) + float(terms.focal)
            + 0.25 * float(terms.boundary))
    assert float(terms.total) == pytest.approx(want, rel=1e-5)


def test_weighted_loss_skip_unused(batch):
    jl, jt, *_ = batch
    terms = L.weighted_loss(jl, jt, bce_ratio=1.0, boundary_ratio=0.0,
                            compute_unused=False)
    assert float(terms.boundary) == 0.0
    assert float(terms.total) > 0.0


def test_composite_matches_components(batch):
    jl, jt, *_ = batch
    got = float(L.composite_loss(jl, jt, lam_ft=1.0, lam_b=0.5,
                                 lam_bce=0.3, lam_dice=0.2))
    ft = float(L.focal_tversky_loss(jl, jt, alpha=0.3, beta=0.7, gamma=0.75))
    want = (ft + 0.5 * float(L.boundary_loss(jl, jt))
            + 0.3 * float(L.bce_with_logits_loss(jl, jt))
            + 0.2 * float(L.dice_loss(jl, jt)))
    assert got == pytest.approx(want, rel=1e-5)


def test_losses_grad_finite(batch):
    jl, jt, *_ = batch
    for fn in (L.dice_loss, L.bce_with_logits_loss, L.focal_tversky_loss,
               L.boundary_loss):
        g = jax.grad(lambda x: fn(x, jt))(jl)
        assert bool(jnp.all(jnp.isfinite(g)))


def test_boundary_gradient_matches_analytic(batch):
    """Gradient flows through the probabilities ONLY: compare against the
    hand-derived closed form sign(p - t) * p(1-p) * EDT / N with the EDT
    from scipy (independent oracle). Any differentiation through the
    distance map — or a wrong chain rule — breaks the exact match."""
    scipy_ndimage = pytest.importorskip("scipy.ndimage")
    jl, jt, *_ = batch
    g = np.asarray(jax.grad(lambda x: L.boundary_loss(x, jt))(jl))

    t = np.asarray(jt, np.float64)
    gt = t.astype(np.uint8)
    dist = np.stack([
        scipy_ndimage.distance_transform_edt(1 - gt[i, ..., 0])
        for i in range(gt.shape[0])])[..., None]
    p = 1.0 / (1.0 + np.exp(-np.asarray(jl, np.float64)))
    n = t.shape[0] * np.prod(t.shape[1:])
    expected = np.sign(p - t) * p * (1.0 - p) * dist / n
    np.testing.assert_allclose(g, expected, atol=1e-6)
    assert np.abs(g).max() > 0


def test_losses_bf16_logits(batch):
    jl, jt, *_ = batch
    bl = jl.astype(jnp.bfloat16)
    a = float(L.dice_loss(jl, jt))
    b = float(L.dice_loss(bl, jt))
    assert a == pytest.approx(b, abs=5e-3)

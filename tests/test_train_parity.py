"""Full train-STEP numerical parity with the torch reference.

Extends the forward parity (test_torch_interop.py) to the complete training
math: identical imported weights and batch, AdamW steps in both frameworks
with all four loss terms live (BCE + Dice + FocalTversky + Boundary,
/root/reference/utils/trainer.py:83-93, models/loss.py:7-83), then assert
loss values and per-parameter update deltas agree. Covers:

- every active-zoo architecture the reference trainer can dispatch
  (/root/reference/utils/trainer.py:83-93 trains whatever main.py built),
  TransUNet in its batch-axis quirk mode with dropout zeroed on both sides
  for determinism;
- one mores.py legacy port (MoresVNet2D) and the legacy model.py UNet;
- a 3-step trajectory (ResUNet): AdamW moments past step 1, the
  CosineAnnealingWarmRestarts schedule (stepped per epoch like
  /root/reference/utils/trainer.py:182 — here steps_per_epoch=1 so every
  step moves the lr), and BatchNorm running-stat drift.

This is the strongest feasible stand-in for a DDTI IoU-parity run (the
dataset is not redistributable).
"""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.models import create_model
from ddti_tpu.train.state import create_train_state
from ddti_tpu.train.steps import make_host_train_step
from ddti_tpu.train.torch_interop import export_state_dict, import_state_dict

torch = pytest.importorskip("torch")

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "models"))


@pytest.fixture(autouse=True)
def _torch_numerics_bn():
    """Parity runs under --bn_exact_variance: flax's default one-pass
    variance (E[x^2]-E[x]^2) diverges from torch's two-pass by ~1e-2
    normwise in train-mode GRADIENTS through f32 cancellation in the
    d(var) chain (QUIRKS #24); two-pass matches torch to its own f32
    conditioning (~2e-3, same profile as torch f32-vs-f64)."""
    from ddti_tpu.models.blocks import set_bn_fast_variance
    set_bn_fast_variance(False)
    yield
    set_bn_fast_variance(True)

SMALL = dict(in_channels=1, out_channels=1, base_filters=16, depth=3)
TRANS_KW = dict(num_transformer_layers=2, num_heads=4, embed_dim=32,
                image_size=64)
FEATS = [8, 16, 32]
LR = 1e-3
RATIOS = dict(bce_ratio=1.0, dice_ratio=1.0, focal_ratio=1.0,
              boundary_ratio=1.0)


def _batch(n=2, size=64):
    rng = np.random.default_rng(0)
    images = rng.normal(0.5, 0.2, (n, size, size, 1)).astype(np.float32)
    # binary masks (a centered disc) — the reference EDT binarizes via
    # astype(uint8), so parity needs strictly {0,1} targets
    yy, xx = np.mgrid[:size, :size]
    masks = np.stack([
        ((yy - 24 - 6 * i) ** 2 + (xx - 30) ** 2 < (10 + 3 * i) ** 2)
        for i in range(n)]).astype(np.float32)[..., None]
    return images, masks


def _zero_dropout(tm):
    """Disable every torch dropout (module AND MHA's functional rate) so a
    train-mode forward is deterministic while BatchNorm keeps its training
    semantics."""
    for m in tm.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
        if isinstance(m, torch.nn.MultiheadAttention):
            m.dropout = 0.0
    return tm


def _make_pair(name):
    """(torch model, jax model name, jax ctor kwargs) with identical
    architectures; torch seeded for reproducible init."""
    sys.path.insert(0, REF)
    torch.manual_seed(0)
    if name in ("MoresVNet2D", "LegacyUNet"):
        # mores.py does `from torchvision.transforms import Resize`
        # (unused) and torchvision is not in this image — stub it
        if "torchvision" not in sys.modules:
            tv = types.ModuleType("torchvision")
            tr = types.ModuleType("torchvision.transforms")
            tr.Resize = object
            tv.transforms = tr
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.transforms"] = tr
        if name == "MoresVNet2D":
            from models import mores
            return mores.VNet2D(1, 1, features=FEATS), name, dict(
                features=FEATS)
        from models import model as legacy
        return legacy.UNet(1, 1), name, {}
    from models import mod
    if name == "TransUNet":
        tm = _zero_dropout(mod.TransUNet(**SMALL, **TRANS_KW))
        return tm, name, dict(batch_axis_attention=True, dropout_rate=0.0,
                              **SMALL, **TRANS_KW)
    return getattr(mod, name)(**SMALL), name, dict(SMALL)


def _torch_steps(tm, images, masks, n_steps=1, scheduler=False):
    """n reference-style train steps; returns (losses, {name: delta},
    {name: running stat}, {name: step-1 grad})."""
    sys.path.insert(0, REF)
    from models.loss import BoundaryLoss, DiceLoss, FocalTverskyLoss

    tm.train()
    opt = torch.optim.AdamW(tm.parameters(), lr=LR)  # trainer.py:41
    sched = (torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=20, T_mult=2, eta_min=0) if scheduler else None)
    x = torch.tensor(images).permute(0, 3, 1, 2)
    t = torch.tensor(masks).permute(0, 3, 1, 2)
    before = {k: v.detach().clone() for k, v in tm.named_parameters()}
    losses = []
    grads1 = None
    for _ in range(n_steps):
        logits = tm(x)
        loss = (torch.nn.BCEWithLogitsLoss()(logits, t)
                + DiceLoss()(logits, t)
                + FocalTverskyLoss()(logits, t)
                + BoundaryLoss()(logits, t))
        opt.zero_grad()
        loss.backward()
        if grads1 is None:
            grads1 = {k: v.grad.detach().clone().numpy()
                      for k, v in tm.named_parameters()}
        opt.step()
        if sched is not None:
            sched.step()  # per-epoch in the reference, trainer.py:182
        losses.append(float(loss.detach()))
    deltas = {k: (v.detach() - before[k]).numpy()
              for k, v in tm.named_parameters()}
    stats = {k: v.detach().numpy() for k, v in tm.state_dict().items()
             if k.endswith(("running_mean", "running_var"))}
    return losses, deltas, stats, grads1


def _jax_steps(name, jkw, sd0, images, masks, n_steps=1,
               steps_per_epoch=100):
    """Import torch init weights, run n fused host-path steps; returns
    (losses, before-params, after-state, step-1 grads)."""
    cfg = Config(batch_size=images.shape[0], image_size=images.shape[1],
                 store_size=images.shape[1], lr=LR, model_type=name,
                 use_mixup=False, compute_unused_losses=False, **RATIOS)
    jm = create_model(name, **jkw)
    state = create_train_state(jm, jax.random.PRNGKey(0),
                               (1, images.shape[1], images.shape[2], 1),
                               LR, steps_per_epoch=steps_per_epoch)
    p0, s0 = import_state_dict(name, sd0, state.params, state.batch_stats)
    state = state.replace(params=p0, batch_stats=s0,
                          opt_state=state.tx.init(p0))
    before = jax.device_get(p0)

    from ddti_tpu.losses import weighted_loss

    def loss_fn(params):
        out, _ = jm.apply({"params": params, "batch_stats": s0},
                          jnp.asarray(images), train=True,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
        logits = out[0] if isinstance(out, tuple) else out
        return weighted_loss(logits, jnp.asarray(masks), **RATIOS).total

    step = make_host_train_step(cfg)
    losses = []
    with jax.default_matmul_precision("highest"):
        grads1 = jax.device_get(jax.grad(loss_fn)(p0))
        for _ in range(n_steps):
            state, m = step(state, jnp.asarray(images), jnp.asarray(masks),
                            jax.random.PRNGKey(1))
            losses.append(float(m.loss))
    return losses, before, state, grads1


def _assert_deltas_close(name, t_deltas, jax_deltas, t_grads, n_steps=1):
    """Per-parameter update-delta agreement in units of lr. AdamW's first
    step is ~sign(g)*lr per element; where |g| is tiny the sign is
    numerically unstable, so allow a vanishing fraction of
    near-zero-gradient elements through (thresholds scale with the number
    of steps as error compounds)."""
    def _rms(a):
        return float(np.sqrt(np.mean(a.astype(np.float64) ** 2)))

    # model-wide gradient scale: f32-conditioning noise is absolute
    # (proportional to the activation/grad magnitudes flowing through the
    # net), so tensors whose ENTIRE gradient sits below ~1e-3 of the
    # model's largest tensor-RMS (attention psi-gate biases: torch's own
    # f32-vs-f64 error there is unbounded) are excluded wholesale.
    gmax_rms = max(_rms(g) for g in t_grads.values())
    checked = 0
    for k, td in t_deltas.items():
        jd = np.asarray(jax_deltas[k])
        tg = t_grads[k]
        # AdamW's first step is ~sign(g)*lr for ANY |g| >> 1e-8, so
        # elements whose gradient sits below the f32-conditioning noise
        # floor (~1e-2 of the tensor RMS on the worst nets, with the
        # absolute model-scale floor above) flip sign between frameworks
        # for a full 2*lr disagreement — a numerical artifact, not a math
        # difference. Compare only elements clearing 3x that floor; a
        # mis-wired layer flips ~half of THOSE and still fails hard.
        live = np.abs(tg) > max(3e-2 * (_rms(tg) + 1e-30),
                                1e-3 * gmax_rms)
        if live.sum() == 0:
            continue  # all-cancelled gradient (psi-gate biases)
        diff = np.abs(jd - td)[live] / LR
        bad = int((diff > 1e-2 * n_steps).sum())
        allowed = max(3, int(2e-3 * n_steps * int(live.sum())))
        assert bad <= allowed, (k, bad, allowed, float(diff.max()))
        assert float(np.median(diff)) < 2e-3 * n_steps, (
            k, float(np.median(diff)))
        checked += 1
    assert checked > 20


# Per-model gradient tolerance overrides (global concatenated rel, worst
# per-param floored rel) where f32 conditioning is intrinsically worse —
# calibrated against torch's OWN f32-vs-f64 gradient error on the same
# net (LegacyUNet 2.7e-2, ImprovedVNet unbounded on its near-zero psi-gate
# grads; both architectures are numerically ill-conditioned, not
# mis-implemented: BN-after-ReLU blocks / attention-psi cancellation).
_GRAD_TOL = {
    "LegacyUNet": (3e-2, 6e-2),
    "ImprovedVNet": (1e-2, 3e-2),
}


def _assert_grads_close(name, t_grads, jax_grads):
    """Gradient agreement — the exact 'both frameworks compute the same
    backward pass' statement, immune to AdamW's sign-of-tiny-gradient
    amplification. Two metrics:

    - GLOBAL concatenated normwise error (catches systematic backward
      differences: the flax fast-variance divergence measured 7.5e-4
      global where the two-pass floor is ~1.5e-4);
    - per-parameter normwise error with a global-scale denominator floor
      (1% of the largest per-param grad norm) so cancellation-dominated
      tiny-norm grads (BN/psi biases — torch's own f32-vs-f64 error is
      unbounded there) are judged against the model's gradient scale. A
      wrong layer mapping still fails at O(1).
    """
    g_tol, p_tol = _GRAD_TOL.get(name, (5e-3, 2e-2))
    tall = np.concatenate([g.ravel() for g in t_grads.values()])
    jall = np.concatenate([np.asarray(jax_grads[k]).ravel()
                           for k in t_grads])
    grel = float(np.linalg.norm(jall - tall) / np.linalg.norm(tall))
    assert grel < g_tol, ("global", grel)
    gmax = max(float(np.linalg.norm(g)) for g in t_grads.values())
    checked = 0
    for k, tg in t_grads.items():
        jg = np.asarray(jax_grads[k])
        denom = max(float(np.linalg.norm(tg)), 1e-2 * gmax)
        err = float(np.linalg.norm(jg - tg)) / denom
        assert err < p_tol, (k, err)
        checked += 1
    assert checked == len(t_grads) and checked > 20


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout not mounted")
@pytest.mark.parametrize("name", [
    # UNet (the cheapest torch+jax compile, ~half the flagship's cost)
    # keeps cross-framework step parity in the fast tier; the other
    # eight run in the full tier (pytest tests/ -m "slow or not slow"),
    # where ResUNet is additionally covered by the 3-step trajectory
    # test below
    "UNet",
    *(pytest.param(n, marks=pytest.mark.slow) for n in (
        "ResUNet", "ASPPUNet", "AttentionUNet", "VNet2D",
        "ImprovedVNet", "TransUNet", "MoresVNet2D", "LegacyUNet"))])
def test_train_step_parity(name):
    tm, jname, jkw = _make_pair(name)
    images, masks = _batch()
    sd0 = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jax_losses, before, state, j_grads = _jax_steps(jname, jkw, sd0,
                                                    images, masks)
    after = jax.device_get(state.params)
    torch_losses, t_deltas, _, t_grads = _torch_steps(tm, images, masks)

    assert jax_losses[0] == pytest.approx(torch_losses[0], rel=1e-5), (
        f"loss {jax_losses[0]} vs {torch_losses[0]}")

    # gradient-level parity: the same backward pass, normwise per param
    _assert_grads_close(name, t_grads,
                        export_state_dict(jname, j_grads, {}))

    # export the jax deltas into reference naming for keywise comparison
    d_after = export_state_dict(
        jname, jax.tree.map(lambda a, b: a - b, after, before),
        state.batch_stats)
    _assert_deltas_close(name, t_deltas, d_after, t_grads)


@pytest.mark.slow
@pytest.mark.skipif(not HAVE_REF, reason="reference checkout not mounted")
def test_train_trajectory_parity_multistep():
    """3 steps on ResUNet with the SGDR schedule advancing every step
    (steps_per_epoch=1 maps our per-step schedule onto the reference's
    per-epoch scheduler.step()): checks AdamW moments past step 1, the
    cosine-warm-restart lr values, and BatchNorm running-stat drift."""
    n_steps = 3
    tm, jname, jkw = _make_pair("ResUNet")
    images, masks = _batch()
    sd0 = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jax_losses, before, state, _ = _jax_steps(jname, jkw, sd0, images,
                                              masks, n_steps=n_steps,
                                              steps_per_epoch=1)
    after = jax.device_get(state.params)
    torch_losses, t_deltas, t_stats, _ = _torch_steps(
        tm, images, masks, n_steps=n_steps, scheduler=True)

    for i, (jl, tl) in enumerate(zip(jax_losses, torch_losses)):
        # step 1 is exact; later steps see the f32-conditioning param
        # divergence compound through the forward
        assert jl == pytest.approx(tl, rel=1e-5 if i == 0 else 1e-3), (
            i, jl, tl)

    # Per-element deltas past step 1 are chaotic (step-2 gradients see
    # step-1 params perturbed at the f32-conditioning floor, and AdamW's
    # per-element normalization amplifies that), so trajectory parity is
    # asserted at the tensor level: direction (cosine) and magnitude
    # (normwise) of each parameter's cumulative 3-step update. Measured
    # healthy values: worst cos 0.993 / rel 0.12; a wrong mapping or
    # schedule gives cos ~0 / rel ~1.
    d_after = export_state_dict(
        jname, jax.tree.map(lambda a, b: a - b, after, before),
        state.batch_stats)
    checked = 0
    for k, td in t_deltas.items():
        jd = np.asarray(d_after[k]).ravel()
        tdr = td.ravel()
        cos = float(np.dot(jd, tdr)
                    / (np.linalg.norm(jd) * np.linalg.norm(tdr) + 1e-30))
        rel = float(np.linalg.norm(jd - tdr)
                    / (np.linalg.norm(tdr) + 1e-30))
        assert cos > 0.98, (k, cos)
        assert rel < 0.25, (k, rel)
        checked += 1
    assert checked > 50

    # BN running stats drifted identically: normwise per stat tensor
    # (flax updates running_var with the biased batch variance where
    # torch Bessel-corrects; plus the same conditioning drift — measured
    # worst 0.7% after 3 steps)
    exported = export_state_dict(jname, {}, state.batch_stats)
    checked = 0
    for k, tv in t_stats.items():
        got = np.asarray(exported[k])
        err = float(np.abs(got - tv).max() / (np.abs(tv).max() + 1e-12))
        assert err < 3e-2, (k, err)
        checked += 1
    assert checked >= 12  # 2 stats x >=6 BN layers at depth 3

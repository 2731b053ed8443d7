"""On-device augmentation pipeline tests: determinism, gating, geometry
invariants, mixup semantics, eval preprocessing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.data import (
    AugmentConfig,
    augment_batch,
    eval_preprocess,
    generate_ddti_like,
    mixup,
)


@pytest.fixture(scope="module")
def batch():
    im, ma = generate_ddti_like(4, (64, 64), 0)
    return (jnp.asarray(im, jnp.float32) / 255.0,
            jnp.asarray(ma, jnp.float32) / 255.0)


def test_deterministic_per_key(batch):
    fi, fm = batch
    cfg = AugmentConfig(use_elastic=True, use_speckle=True, use_tgc=True,
                        use_clahe=True, out_size=(64, 64))
    a1 = augment_batch(jax.random.PRNGKey(7), fi, fm, cfg)
    a2 = augment_batch(jax.random.PRNGKey(7), fi, fm, cfg)
    assert bool(jnp.all(a1[0] == a2[0])) and bool(jnp.all(a1[1] == a2[1]))
    a3 = augment_batch(jax.random.PRNGKey(8), fi, fm, cfg)
    assert not bool(jnp.all(a1[0] == a3[0]))


def test_all_gates_off_is_resize_only(batch):
    fi, fm = batch
    cfg = AugmentConfig(p_flip=0.0, p_rotate=0.0, p_brightness=0.0,
                        out_size=(64, 64))
    ai, am = augment_batch(jax.random.PRNGKey(0), fi, fm, cfg)
    np.testing.assert_allclose(np.asarray(ai), np.asarray(fi), atol=1e-6)
    np.testing.assert_allclose(np.asarray(am), np.asarray(fm), atol=1e-6)


def test_flip_always_on_matches_manual(batch):
    fi, fm = batch
    cfg = AugmentConfig(p_flip=1.0, p_rotate=0.0, p_brightness=0.0,
                        out_size=(64, 64))
    ai, am = augment_batch(jax.random.PRNGKey(0), fi, fm, cfg)
    # h+v flip == 180-degree rotation of the array
    np.testing.assert_allclose(np.asarray(ai),
                               np.asarray(fi)[:, ::-1, ::-1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(am),
                               np.asarray(fm)[:, ::-1, ::-1], atol=1e-6)


def test_shared_geometry_one_draw_per_batch(batch):
    """shared_geometry=True: every image in the batch gets the SAME
    flip/rotation. Feed one image replicated — all outputs must be
    identical (with per-image draws, PRNGKey(3) produces distinct warps,
    asserted as the control)."""
    fi, fm = batch
    rep_i = jnp.broadcast_to(fi[:1], fi.shape)
    rep_m = jnp.broadcast_to(fm[:1], fm.shape)
    cfg = AugmentConfig(p_flip=1.0, p_rotate=1.0, p_brightness=0.0,
                        out_size=(64, 64), shared_geometry=True)
    ai, am = augment_batch(jax.random.PRNGKey(3), rep_i, rep_m, cfg)
    assert bool(jnp.all(ai == ai[:1])) and bool(jnp.all(am == am[:1]))
    # something actually happened (not the identity warp)
    assert not bool(jnp.all(ai == rep_i))
    # control: per-image draws differ across the batch
    cfg_pi = AugmentConfig(p_flip=1.0, p_rotate=1.0, p_brightness=0.0,
                           out_size=(64, 64))
    bi, _ = augment_batch(jax.random.PRNGKey(3), rep_i, rep_m, cfg_pi)
    assert not bool(jnp.all(bi == bi[:1]))


def test_shared_geometry_off_stream_unchanged(batch):
    """Adding the flag must not perturb the default per-image PRNG
    stream (flag-off results are bit-identical to the historical path)."""
    fi, fm = batch
    cfg_on_then_off = AugmentConfig(out_size=(64, 64), shared_geometry=False)
    cfg_plain = AugmentConfig(out_size=(64, 64))
    a = augment_batch(jax.random.PRNGKey(11), fi, fm, cfg_on_then_off)
    b = augment_batch(jax.random.PRNGKey(11), fi, fm, cfg_plain)
    assert bool(jnp.all(a[0] == b[0])) and bool(jnp.all(a[1] == b[1]))


def test_mask_stays_binary_under_geometry(batch):
    fi, fm = batch
    # binary input masks + nearest mask resampling + identity resize
    cfg = AugmentConfig(use_elastic=True, p_flip=1.0, p_rotate=1.0,
                        p_brightness=0.0, p_elastic=1.0, out_size=(64, 64))
    _, am = augment_batch(jax.random.PRNGKey(3), fi, fm, cfg)
    vals = np.unique(np.asarray(am))
    assert set(np.round(vals, 3)).issubset({0.0, 1.0})


def test_brightness_only_scales_images(batch):
    fi, fm = batch
    cfg = AugmentConfig(p_flip=0.0, p_rotate=0.0, p_brightness=1.0,
                        out_size=(64, 64))
    ai, am = augment_batch(jax.random.PRNGKey(5), fi, fm, cfg)
    np.testing.assert_allclose(np.asarray(am), np.asarray(fm), atol=1e-6)
    assert not np.allclose(np.asarray(ai), np.asarray(fi))
    assert float(ai.max()) <= 1.0 and float(ai.min()) >= 0.0


def test_speckle_tgc_clahe_image_only(batch):
    fi, fm = batch
    cfg = AugmentConfig(use_speckle=True, use_tgc=True, use_clahe=True,
                        p_flip=0.0, p_rotate=0.0, p_brightness=0.0,
                        p_speckle=1.0, p_tgc=1.0, p_clahe=1.0,
                        out_size=(64, 64))
    ai, am = augment_batch(jax.random.PRNGKey(6), fi, fm, cfg)
    np.testing.assert_allclose(np.asarray(am), np.asarray(fm), atol=1e-6)
    assert not np.allclose(np.asarray(ai), np.asarray(fi))


def test_output_size(batch):
    fi, fm = batch
    cfg = AugmentConfig(out_size=(48, 32))
    ai, am = augment_batch(jax.random.PRNGKey(0), fi, fm, cfg)
    assert ai.shape == (4, 48, 32, 1) and am.shape == (4, 48, 32, 1)


def test_mixup_prob_zero_identity(batch):
    fi, fm = batch
    mi, mm = mixup(jax.random.PRNGKey(0), fi, fm, alpha=0.2, prob=0.0)
    np.testing.assert_allclose(np.asarray(mi), np.asarray(fi))
    np.testing.assert_allclose(np.asarray(mm), np.asarray(fm))


def test_mixup_blends_with_permutation(batch):
    """Feed constant-valued images (image b = b/(n-1)) so the blend is
    solvable from the outputs: every output must be exactly
    lam * in_b + (1-lam) * in_p(b) for ONE shared lam in (0, 1) and a
    permutation p — an identity transform (inverted gate / lam collapsed
    to 1) fails the lam-in-(0,1) check, not just a loose mass bound."""
    fi, fm = batch
    n = fi.shape[0]
    vals = np.arange(n, dtype=np.float32) / (n - 1)
    ci = jnp.broadcast_to(vals[:, None, None, None], fi.shape)
    # pick a key whose gate fires and lam is interior
    mi, mm = mixup(jax.random.PRNGKey(1), ci, ci, alpha=0.2, prob=1.0)
    out = np.asarray(mi)
    assert np.ptp(out.reshape(n, -1), axis=1).max() < 1e-6, \
        "constant inputs must stay constant under a scalar blend"
    out_vals = out.reshape(n, -1)[:, 0].astype(np.float64)
    # solve lam from a row whose partner differs, then check the whole
    # batch is consistent with ONE lam and a valid permutation
    lam_cands = {round(float(la), 6)
                 for b in range(n) for j in range(n) if j != b
                 for la in [(out_vals[b] - vals[j]) / (vals[b] - vals[j])]
                 if 0.0 < la < 1.0}
    ok = False
    for lam in lam_cands:
        partners = []
        for b in range(n):
            j = (out_vals[b] - lam * vals[b]) / (1.0 - lam) * (n - 1)
            partners.append(int(round(j)))
        recon = [lam * vals[b] + (1 - lam) * vals[p] / 1.0
                 for b, p in enumerate(partners)]
        if (sorted(partners) == list(range(n))
                and np.allclose(recon, out_vals, atol=1e-5)):
            ok = True
            break
    assert ok, f"outputs {out_vals} are not a single-lam permutation blend"
    # images and masks share lam and permutation
    np.testing.assert_allclose(np.asarray(mm), out, atol=1e-6)
    # and on the real batch: soft labels in [0,1], mass preserved
    mi2, mm2 = mixup(jax.random.PRNGKey(1), fi, fm, alpha=0.2, prob=1.0)
    assert float(mm2.min()) >= 0.0 and float(mm2.max()) <= 1.0
    np.testing.assert_allclose(float(mm2.sum()), float(fm.sum()), rtol=1e-5)


def test_eval_preprocess_resizes_both(batch):
    fi, fm = batch
    ei, em = eval_preprocess(fi, fm, (32, 32))
    assert ei.shape == (4, 32, 32, 1) and em.shape == (4, 32, 32, 1)
    # bilinear mask resize produces soft values (reference quirk preserved)
    vals = np.unique(np.asarray(em))
    assert ((vals > 0) & (vals < 1)).any()


def test_rotate_by_key_changes_geometry(batch):
    fi, fm = batch
    cfg = AugmentConfig(p_flip=0.0, p_rotate=1.0, p_brightness=0.0,
                        out_size=(64, 64))
    ai, am = augment_batch(jax.random.PRNGKey(11), fi, fm, cfg)
    assert not np.allclose(np.asarray(am), np.asarray(fm))
    # mask pixel count approximately preserved under rotation (interior blob)
    before = float(fm.sum())
    after = float(am.sum())
    assert after == pytest.approx(before, rel=0.25)


def test_crop_gated_and_applied(batch):
    fi, fm = batch
    cfg_off = AugmentConfig(p_crop=0.0, p_flip=0.0, p_rotate=0.0,
                            p_brightness=0.0, out_size=(64, 64))
    ai, am = augment_batch(jax.random.PRNGKey(2), fi, fm, cfg_off)
    np.testing.assert_allclose(np.asarray(ai), np.asarray(fi), atol=1e-6)
    cfg_on = AugmentConfig(p_crop=1.0, crop_frac=0.5, p_flip=0.0,
                           p_rotate=0.0, p_brightness=0.0, out_size=(64, 64))
    ci, cm = augment_batch(jax.random.PRNGKey(2), fi, fm, cfg_on)
    assert ci.shape == fi.shape
    assert not np.allclose(np.asarray(ci), np.asarray(fi))

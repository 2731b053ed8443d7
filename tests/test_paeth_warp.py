"""Paeth three-shear fast warp (ops/resample.paeth_flip_rotate, QUIRKS #23).

The --aug_fast_warp path (training default since round 5; low-level
AugmentConfig default stays False for oracle parity) replaces the
per-element warp gather with
an exact 90k pre-rotation plus three barrel-shifted integer shears. It must
be EXACTLY equal to the reference-parity warp (fused_flip_rotate, itself
PIL-verified) for angle 0, pure flips, and 90-degree multiples, and within
~1.5 px source displacement elsewhere. Reference semantics being
approximated: /root/reference/utils/transforms.py:114-141.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddti_tpu.data.augment import AugmentConfig, augment_batch
from ddti_tpu.ops.resample import fused_flip_rotate, paeth_flip_rotate

H = W = 64


@pytest.fixture(scope="module")
def planes():
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((H, W)), jnp.float32)
    mask = jnp.asarray(rng.random((H, W)) > 0.5, jnp.float32)
    return img, mask


def _both(img, mask, fh, fv, ang):
    args = (img, mask, jnp.asarray(fh), jnp.asarray(fv),
            jnp.asarray(ang, jnp.float32))
    return fused_flip_rotate(*args), paeth_flip_rotate(*args)


@pytest.mark.parametrize("fh", [False, True])
@pytest.mark.parametrize("fv", [False, True])
@pytest.mark.parametrize("ang", [0.0, 90.0, -90.0, 180.0, -180.0])
def test_exact_at_quarter_turns_and_flips(planes, fh, fv, ang):
    (ei, em), (pi, pm) = _both(*planes, fh, fv, ang)
    np.testing.assert_array_equal(np.asarray(ei), np.asarray(pi))
    np.testing.assert_array_equal(np.asarray(em), np.asarray(pm))


def test_subpixel_displacement_at_random_angles():
    # warp coordinate-encoding planes through both paths and compare which
    # source pixel each output pixel picked
    rows = jnp.asarray(np.broadcast_to(np.arange(1, H + 1)[:, None],
                                       (H, W)), jnp.float32)
    cols = jnp.asarray(np.broadcast_to(np.arange(1, W + 1)[None, :],
                                       (H, W)), jnp.float32)
    rng = np.random.default_rng(3)
    worst = 0.0
    for ang in rng.uniform(-180, 180, 25):
        (ey, ex), (py, px) = _both(rows, cols, False, False, float(ang))
        valid = np.asarray((ey > 0) & (py > 0))  # zero-fill excluded
        d = np.hypot(np.asarray(ey - py), np.asarray(ex - px))[valid]
        worst = max(worst, float(d.max()))
        assert d.mean() < 0.6, (ang, d.mean())
    assert worst <= 1.6, worst  # each divergent pixel picks a neighbor


def test_mask_values_preserved(planes):
    # the warp is rolls + selects: values pass through bit-exact, so a
    # binary mask stays binary (no blending, unlike a bilinear resample)
    _, mask = planes
    for ang in (33.3, -127.9, 74.1):
        _, pm = _both(*planes, True, False, ang)[1]
        assert set(np.unique(np.asarray(pm))) <= {0.0, 1.0}


def test_augment_batch_fast_warp_matches_exact_for_flips():
    # p_rotate=0 keeps every draw in the exact-equality regime, so the
    # fast_warp=True chain must be bit-identical to the default chain
    rng = np.random.default_rng(11)
    imgs = jnp.asarray(rng.random((4, H, W, 1)), jnp.float32)
    masks = jnp.asarray(rng.random((4, H, W, 1)) > 0.6, jnp.float32)
    key = jax.random.PRNGKey(0)
    base = dict(p_flip=1.0, p_rotate=0.0, p_brightness=0.0,
                out_size=(H, W))
    a_img, a_msk = augment_batch(key, imgs, masks, AugmentConfig(**base))
    b_img, b_msk = augment_batch(key, imgs, masks,
                                 AugmentConfig(fast_warp=True, **base))
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    np.testing.assert_array_equal(np.asarray(a_msk), np.asarray(b_msk))


def test_augment_batch_fast_warp_rotates():
    # with rotation on, the fast chain still produces a valid warp: same
    # foreground mass ballpark, values preserved, output shape right
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.random((3, H, W, 1)), jnp.float32)
    masks = jnp.zeros((3, H, W, 1), jnp.float32)
    masks = masks.at[:, 20:40, 24:44, :].set(1.0)
    cfg = AugmentConfig(fast_warp=True, p_flip=0.5, p_rotate=1.0,
                        p_brightness=0.0, out_size=(H, W))
    out_img, out_msk = augment_batch(jax.random.PRNGKey(2), imgs, masks, cfg)
    assert out_img.shape == (3, H, W, 1)
    assert set(np.unique(np.asarray(out_msk))) <= {0.0, 1.0}
    # rigid motion + boundary clipping: mass can only shrink, and for a
    # centered 20x20 box under any rotation it survives mostly intact
    for i in range(3):
        m0 = float(jnp.sum(masks[i]))
        m1 = float(jnp.sum(out_msk[i]))
        assert 0.85 * m0 <= m1 <= m0 + 1e-6


def test_non_square_falls_back_to_exact_gather():
    rng = np.random.default_rng(9)
    imgs = jnp.asarray(rng.random((2, 32, 48, 1)), jnp.float32)
    masks = jnp.asarray(rng.random((2, 32, 48, 1)) > 0.5, jnp.float32)
    key = jax.random.PRNGKey(4)
    cfg_fast = AugmentConfig(fast_warp=True, out_size=(32, 48))
    cfg_ref = AugmentConfig(out_size=(32, 48))
    a = augment_batch(key, imgs, masks, cfg_fast)
    b = augment_batch(key, imgs, masks, cfg_ref)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_paeth_rejects_non_square_directly():
    with pytest.raises(ValueError):
        paeth_flip_rotate(jnp.zeros((4, 8)), jnp.zeros((4, 8)),
                          jnp.asarray(False), jnp.asarray(False),
                          jnp.asarray(10.0))

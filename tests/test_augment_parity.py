"""Distribution-level parity between the on-device augmentation pipeline
and the host PIL/cv2 oracle chain.

Per-op numerics are covered in test_ops.py; here we check the two *chains*
produce statistically indistinguishable augmented data (the guarantee that
training on the device path matches training on the reference's host path).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

from ddti_tpu.data import AugmentConfig, augment_batch, generate_ddti_like
from ddti_tpu.data.host_transforms import build_train_chain

N_TRIALS = 64
SIZE = 64


@pytest.fixture(scope="module")
def sample():
    imgs, masks = generate_ddti_like(1, (SIZE, SIZE), 3)
    return imgs[0, :, :, 0], masks[0, :, :, 0]


def _device_population(img, mask, cfg, n=N_TRIALS):
    fi = jnp.asarray(img, jnp.float32)[None, ..., None] / 255.0
    fm = jnp.asarray(mask, jnp.float32)[None, ..., None] / 255.0
    fi = jnp.tile(fi, (n, 1, 1, 1))
    fm = jnp.tile(fm, (n, 1, 1, 1))
    ai, am = augment_batch(jax.random.PRNGKey(0), fi, fm, cfg)
    return np.asarray(ai)[..., 0], np.asarray(am)[..., 0]


def _host_population(img, mask, chain, n=N_TRIALS):
    rng = random.Random(0)
    outs_i, outs_m = [], []
    pi = Image.fromarray(img)
    pm = Image.fromarray(mask)
    for _ in range(n):
        oi, om = chain(pi, pm, rng)
        outs_i.append(oi[..., 0])
        outs_m.append(om[..., 0])
    return np.stack(outs_i), np.stack(outs_m)


def test_chain_statistics_match(sample):
    img, mask = sample
    cfg = AugmentConfig(out_size=(SIZE, SIZE))
    chain = build_train_chain(out_size=(SIZE, SIZE))
    di, dm = _device_population(img, mask, cfg)
    hi, hm = _host_population(img, mask, chain)
    # image intensity distribution (brightness jitter + geometry)
    assert di.mean() == pytest.approx(hi.mean(), rel=0.12)
    assert di.std() == pytest.approx(hi.std(), rel=0.15)
    # mask foreground area distribution (geometry only)
    assert dm.mean() == pytest.approx(hm.mean(), rel=0.15)


def test_chain_statistics_match_full_extras(sample):
    img, mask = sample
    cfg = AugmentConfig(use_speckle=True, use_tgc=True, use_clahe=True,
                        out_size=(SIZE, SIZE))
    chain = build_train_chain(use_speckle=True, use_tgc=True, use_clahe=True,
                              out_size=(SIZE, SIZE))
    di, _ = _device_population(img, mask, cfg)
    hi, _ = _host_population(img, mask, chain)
    assert di.mean() == pytest.approx(hi.mean(), rel=0.15)
    assert di.std() == pytest.approx(hi.std(), rel=0.2)


def test_identity_when_all_probs_zero(sample):
    """With every gate off both chains are the bare Resize + ToTensor —
    outputs must agree pixelwise (PIL vs jax bilinear at identity size)."""
    img, mask = sample
    cfg = AugmentConfig(p_flip=0.0, p_rotate=0.0, p_brightness=0.0,
                        out_size=(SIZE, SIZE))
    di, dm = _device_population(img, mask, cfg, n=1)
    fi = np.asarray(img, np.float32) / 255.0
    fm = np.asarray(mask, np.float32) / 255.0
    np.testing.assert_allclose(di[0], fi, atol=1e-6)
    np.testing.assert_allclose(dm[0], fm, atol=1e-6)


def test_device_downscale_matches_pil():
    """The store!=image_size path: device downscale must follow the PIL
    bilinear convention (area-weighted triangle filter) the reference's
    eval/train Resize inherits from operating on PIL images
    (/root/reference/utils/transforms.py:143-150). Within 1 gray level."""
    from ddti_tpu.ops.resample import resize_bilinear_hw

    imgs, _ = generate_ddti_like(2, (128, 128), 7)
    for out in (64, 50):  # power-of-two and odd ratios
        for i in range(imgs.shape[0]):
            src = imgs[i, :, :, 0]
            pil = np.asarray(
                Image.fromarray(src.astype(np.float32), "F").resize(
                    (out, out), Image.BILINEAR), np.float32)
            dev = np.asarray(resize_bilinear_hw(
                jnp.asarray(src, jnp.float32), out, out))
            assert np.abs(dev - pil).max() <= 1.0


def test_device_downscale_noaa_matches_torch():
    """antialias=False is exact torch F.interpolate(align_corners=False)."""
    import torch
    import torch.nn.functional as F

    from ddti_tpu.ops.resample import resize_bilinear_hw

    imgs, _ = generate_ddti_like(1, (128, 128), 9)
    src = imgs[0, :, :, 0].astype(np.float32)
    tor = F.interpolate(torch.from_numpy(src[None, None]), (50, 50),
                        mode="bilinear", align_corners=False)[0, 0].numpy()
    dev = np.asarray(resize_bilinear_hw(jnp.asarray(src), 50, 50,
                                        antialias=False))
    np.testing.assert_allclose(dev, tor, atol=1e-3)

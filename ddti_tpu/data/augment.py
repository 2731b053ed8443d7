"""Fully on-device, batched, jit-fused augmentation pipeline.

The reference runs its augmentation chain per image on the host in DataLoader
worker processes (PIL/cv2, /root/reference/utils/transforms.py + main.py
build_train_transform :66-91). Here the whole chain is one jittable function
over a batch, driven by a single PRNG key — it fuses into the train step and
runs on the TPU's VPU, leaving the host out of the steady state entirely.

Chain (matching build_train_transform order and default probabilities):
  [ElasticDeform p=.25] -> Flip(.5 h, .5 v) -> Rotate(.5, U(-180,180), nearest)
  -> AdjustBrightness(.5, U(0.5,1.5)) -> [Speckle p=.3] -> [TGC p=.25]
  -> [CLAHE p=.3] -> Resize(out_size, bilinear, both image AND mask)

Conventions:
- inputs are float32 NHWC in [0, 1] (images) and [0, 1] (masks);
- masks get nearest resampling for elastic/rotate like the reference, and
  BILINEAR final resize (the reference resizes masks bilinearly, producing
  soft targets — a quirk we preserve);
- each sample draws its own gates/parameters (the reference draws per image
  in __getitem__; identical distribution).

The exact host chain (PIL/cv2 semantics, byte-for-byte) lives in
``ddti_tpu.data.host_transforms`` and serves as the parity oracle in tests.
"""

from __future__ import annotations

import dataclasses
import functools


import jax
import jax.numpy as jnp

from ddti_tpu.ops.clahe import clahe_float
from ddti_tpu.ops.resample import (
    fused_flip_rotate,
    gaussian_blur_17,
    paeth_flip_rotate,
    remap_pair,
    resize_bilinear_hw,
)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Static augmentation switches/probabilities (hashable: safe as a jit
    static argument)."""

    use_elastic: bool = False
    use_speckle: bool = False
    use_tgc: bool = False
    use_clahe: bool = False
    p_crop: float = 0.0
    crop_frac: float = 0.8   # crop window size as a fraction of H/W
    p_elastic: float = 0.25
    p_flip: float = 0.5
    p_rotate: float = 0.5
    p_brightness: float = 0.5
    p_speckle: float = 0.3
    p_tgc: float = 0.25
    p_clahe: float = 0.3
    elastic_alpha: tuple = (20.0, 40.0)
    elastic_sigma: tuple = (6.0, 10.0)
    speckle_sigma: tuple = (0.05, 0.15)
    tgc_bins: int = 10
    tgc_gain: tuple = (0.8, 1.2)
    clahe_clip: float = 2.0
    clahe_grid: tuple = (4, 4)
    brightness: tuple = (0.5, 1.5)
    out_size: tuple = (512, 512)
    # Opt-in perf mode: ONE flip/rotation draw for the whole batch. The
    # shared gather index vectorizes ~11x better than per-image indices on
    # TPU (6.6 vs 73 ms per 128x256^2 batch — benchmarks/PERF_NOTES.md),
    # at the cost of batch-correlated geometry: a deliberate divergence
    # from the reference's per-image draws (QUIRKS.md), default OFF.
    shared_geometry: bool = False
    # Paeth three-shear flip+rotate (barrel shifter, no gather: 75 -> ~8 ms
    # per 128x256^2 batch) with PER-IMAGE geometry preserved. Sub-pixel
    # nearest-rounding divergence from the PIL map (mean 0.3 px, max 1.4 px
    # source displacement; exact at 0/90/180/270 and for flips) —
    # QUIRKS.md #23. Default OFF at this low level (the oracle-parity
    # contract); the training Config default is ON since round 5
    # (core/config.py aug_fast_warp, --aug_exact_warp restores parity).
    # Square images only (non-square falls back to the exact gather warp).
    fast_warp: bool = False


def _u(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _gate(key, p, shape=()):
    return jax.random.uniform(key, shape) < p


def _crop_one(key, img, mask, cfg: AugmentConfig):
    """RandomCrop analogue (/root/reference/utils/transforms.py:95-112 —
    defined there but unused by main). Device version: slice a random
    (crop_frac*H, crop_frac*W) window and resize it back to (H, W) so the
    chain keeps static shapes (the reference chain resizes at the end
    anyway)."""
    h, w = img.shape
    ch = max(int(h * cfg.crop_frac), 1)
    cw = max(int(w * cfg.crop_frac), 1)
    k_gate, k_t, k_l = jax.random.split(key, 3)
    top = jax.random.randint(k_t, (), 0, h - ch + 1)
    left = jax.random.randint(k_l, (), 0, w - cw + 1)
    img_c = jax.lax.dynamic_slice(img, (top, left), (ch, cw))
    mask_c = jax.lax.dynamic_slice(mask, (top, left), (ch, cw))
    img_c = resize_bilinear_hw(img_c, h, w)
    mask_c = resize_bilinear_hw(mask_c, h, w)
    on = _gate(k_gate, cfg.p_crop)
    return jnp.where(on, img_c, img), jnp.where(on, mask_c, mask)


def _elastic_one(key, img, mask, cfg: AugmentConfig):
    h, w = img.shape
    k_gate, k_a, k_s, k_dx, k_dy = jax.random.split(key, 5)
    alpha = _u(k_a, *cfg.elastic_alpha)
    sigma = _u(k_s, *cfg.elastic_sigma)
    dx = gaussian_blur_17(_u(k_dx, -1.0, 1.0, (h, w)), sigma) * alpha
    dy = gaussian_blur_17(_u(k_dy, -1.0, 1.0, (h, w)), sigma) * alpha
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    img_d, mask_d = remap_pair(img, mask, yy + dy, xx + dx)
    on = _gate(k_gate, cfg.p_elastic)
    return (jnp.where(on, img_d, img), jnp.where(on, mask_d, mask))


def _brightness_one(key, img, cfg):
    k_gate, k_f = jax.random.split(key)
    f = _u(k_f, *cfg.brightness)
    on = _gate(k_gate, cfg.p_brightness)
    return jnp.where(on, jnp.clip(img * f, 0.0, 1.0), img)


def _speckle_one(key, img, cfg):
    k_gate, k_s, k_n = jax.random.split(key, 3)
    sigma = _u(k_s, *cfg.speckle_sigma)
    noise = jax.random.normal(k_n, img.shape) * sigma
    out = jnp.clip(img + img * noise, 0.0, 1.0)
    return jnp.where(_gate(k_gate, cfg.p_speckle), out, img)


def _tgc_one(key, img, cfg):
    """Per-depth-band random gain. The reference scales rows
    [i*bin_h, (i+1)*bin_h) leaving a remainder strip untouched when
    H % num_bins != 0 — reproduced via a row->band index map."""
    h, w = img.shape
    k_gate, k_g = jax.random.split(key)
    gains = _u(k_g, *cfg.tgc_gain, (cfg.tgc_bins,))
    bin_h = h // cfg.tgc_bins
    rows = jnp.arange(h) // max(bin_h, 1)
    in_band = rows < cfg.tgc_bins
    g = jnp.where(in_band, gains[jnp.clip(rows, 0, cfg.tgc_bins - 1)], 1.0)
    out = jnp.clip(img * g[:, None], 0.0, 1.0)
    return jnp.where(_gate(k_gate, cfg.p_tgc), out, img)


def _clahe_one(key, img, cfg):
    out = clahe_float(img, cfg.clahe_clip, tuple(cfg.clahe_grid))
    return jnp.where(_gate(key, cfg.p_clahe), out, img)


def _draw_warp(k_flip, k_rot, cfg: AugmentConfig):
    """Flip gates + gated rotation angle for one warp draw."""
    kh, kv = jax.random.split(k_flip)
    k_gate, k_ang = jax.random.split(k_rot)
    fh = _gate(kh, cfg.p_flip)
    fv = _gate(kv, cfg.p_flip)
    ang = _u(k_ang, -180.0, 180.0) * _gate(k_gate, cfg.p_rotate)
    return fh, fv, ang


def _augment_one(key, img, mask, cfg: AugmentConfig, warp=None):
    """img, mask: (H, W) float32 in [0,1]. ``warp`` (fh, fv, ang) overrides
    the per-image flip/rotation draw (the shared_geometry path)."""
    keys = jax.random.split(key, 8)
    if cfg.p_crop > 0:
        img, mask = _crop_one(keys[7], img, mask, cfg)
    if cfg.use_elastic:
        img, mask = _elastic_one(keys[0], img, mask, cfg)
    # flip + rotate fused into one warp; draw the gates/angle with the same
    # key layout as the sequential path so streams stay reproducible
    if warp is None:
        warp = _draw_warp(keys[1], keys[2], cfg)
    fh, fv, ang = warp
    if cfg.fast_warp and img.shape[0] == img.shape[1]:
        img, mask = paeth_flip_rotate(img, mask, fh, fv, ang)
    else:
        img, mask = fused_flip_rotate(img, mask, fh, fv, ang)
    img = _brightness_one(keys[3], img, cfg)
    if cfg.use_speckle:
        img = _speckle_one(keys[4], img, cfg)
    if cfg.use_tgc:
        img = _tgc_one(keys[5], img, cfg)
    if cfg.use_clahe:
        img = _clahe_one(keys[6], img, cfg)
    return img, mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
                  cfg: AugmentConfig):
    """Augment a batch. images/masks: (N, H, W, 1) float32 [0,1] ->
    (N, out_h, out_w, 1)."""
    n = images.shape[0]
    keys = jax.random.split(key, n)
    warp = None
    if cfg.shared_geometry:
        # one batch-wide draw; closed over, so vmap leaves it unbatched and
        # XLA sees a batch-invariant gather index (the fast vector path)
        kf1, kf2 = jax.random.split(jax.random.fold_in(key, 1))
        warp = _draw_warp(kf1, kf2, cfg)
    img2, mask2 = jax.vmap(
        lambda k, i, m: _augment_one(k, i, m, cfg, warp)
    )(keys, images[..., 0], masks[..., 0])
    oh, ow = cfg.out_size
    if (oh, ow) != img2.shape[1:3]:  # identity resize elided
        img2 = resize_bilinear_hw(img2, oh, ow)
        mask2 = resize_bilinear_hw(mask2, oh, ow)
    return img2[..., None], mask2[..., None]


@functools.partial(jax.jit, static_argnames=("out_size",))
def eval_preprocess(images: jnp.ndarray, masks: jnp.ndarray,
                    out_size: tuple = (512, 512)):
    """The test/val transform: Resize + (implicit) ToTensor."""
    oh, ow = out_size
    if (oh, ow) == images.shape[1:3]:
        return images, masks
    return (resize_bilinear_hw(images[..., 0], oh, ow)[..., None],
            resize_bilinear_hw(masks[..., 0], oh, ow)[..., None])


def mixup(key: jax.Array, images: jnp.ndarray, masks: jnp.ndarray,
          alpha: float, prob: float):
    """Batch mixup exactly as the Trainer applies it
    (/root/reference/utils/trainer.py:62-78): with probability ``prob`` draw
    one lambda ~ Beta(alpha, alpha) for the whole batch, blend the batch
    with a random permutation of itself (images AND masks -> soft labels)."""
    k_gate, k_lam, k_perm = jax.random.split(key, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, images.shape[0])
    on = jax.random.uniform(k_gate) < prob
    lam = jnp.where(on, lam, 1.0)
    images = lam * images + (1.0 - lam) * images[perm]
    masks = lam * masks + (1.0 - lam) * masks[perm]
    return images, masks

"""Augmentation preview: render what the device training pipeline will
actually feed the model.

  python -m ddti_tpu.cli.preview --output preview.png \
      [--use_elastic true --use_clahe true ...] [--count 4 --variants 5] \
      [--dataset_path DIR | --synthetic] [--seed 42] [--cpu]

One grid PNG: each row is a source image — column 0 the original (ground
-truth contour in blue), the remaining columns independent draws of the
jit-fused device augmentation chain (``data/augment.py``), mask contour
tracking each draw. Flags mirror the training CLI, so pasting a training
command's augmentation flags previews exactly that run's input
distribution (same ``AugmentConfig``, same uint8->float ingestion as
``make_train_step``; mixup is excluded — it blends across the batch
after augmentation).

The torch reference has no equivalent — its transform stack
(/root/reference/utils/transforms.py) can only be inspected by hand.
"""

from __future__ import annotations

import argparse
import os


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "t", "yes", "y", "1"):
        return True
    if v.lower() in ("false", "f", "no", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="preview_augment.png")
    ap.add_argument("--count", type=int, default=4,
                    help="source images (grid rows)")
    ap.add_argument("--variants", type=int, default=5,
                    help="augmented draws per image (grid columns - 1)")
    ap.add_argument("--dataset_path", default="data/dataset")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic DDTI-like frames (default when no "
                         "dataset tree exists at --dataset_path)")
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--store_size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=42)
    # augmentation flags, training-CLI names
    ap.add_argument("--use_elastic", type=_str2bool, default=False)
    ap.add_argument("--use_speckle", type=_str2bool, default=False)
    ap.add_argument("--use_tgc", type=_str2bool, default=False)
    ap.add_argument("--use_clahe", type=_str2bool, default=False)
    ap.add_argument("--p_crop", type=float, default=0.0)
    ap.add_argument("--aug_shared_geometry", action="store_true")
    ap.add_argument("--aug_fast_warp", action="store_true", default=True)
    ap.add_argument("--aug_exact_warp", dest="aug_fast_warp",
                    action="store_false")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ddti_tpu.core import Config
    from ddti_tpu.data import generate_ddti_like
    from ddti_tpu.data.augment import augment_batch
    from ddti_tpu.train.engine import aug_config_from

    n = max(args.count, 1)
    size = (args.store_size, args.store_size)
    root = args.dataset_path
    if args.synthetic or not os.path.isdir(os.path.join(root, "train")):
        images, masks = generate_ddti_like(n, size, args.seed)
    else:
        from ddti_tpu.data import MedicalDataset, decode_to_store
        ds = MedicalDataset(os.path.join(root, "train"),
                            os.path.join(root, "train_mask"))
        images, masks = decode_to_store(ds, size)
        images, masks = images[:n], masks[:n]
        n = len(images)

    cfg = Config(image_size=args.image_size, store_size=args.store_size,
                 use_elastic=args.use_elastic, use_speckle=args.use_speckle,
                 use_tgc=args.use_tgc, use_clahe=args.use_clahe,
                 p_crop=args.p_crop,
                 aug_shared_geometry=args.aug_shared_geometry,
                 aug_fast_warp=args.aug_fast_warp)
    aug_cfg = aug_config_from(cfg)

    imf = jnp.asarray(images, jnp.float32) / 255.0
    maf = jnp.asarray(masks, jnp.float32) / 255.0
    aug = jax.jit(lambda k: augment_batch(k, imf, maf, aug_cfg))
    base = jax.random.PRNGKey(args.seed)
    draws = [jax.device_get(aug(jax.random.fold_in(base, v)))
             for v in range(max(args.variants, 1))]

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ddti_tpu.eval.contours import find_contours

    def panel(ax, img, mask, color):
        ax.imshow(np.asarray(img)[..., 0], cmap="gray", vmin=0.0, vmax=1.0)
        for c in find_contours(np.asarray(mask)[..., 0], 0.5):
            ax.plot(c[:, 1], c[:, 0], color=color, linewidth=1)
        ax.axis("off")

    ncols = 1 + len(draws)
    fig, axes = plt.subplots(n, ncols, figsize=(2.2 * ncols, 2.2 * n),
                             squeeze=False)
    for i in range(n):
        panel(axes[i][0], np.asarray(images[i], np.float32) / 255.0,
              np.asarray(masks[i], np.float32) / 255.0, "blue")
        if i == 0:
            axes[i][0].set_title("original", fontsize=9)
        for v, (ai, am) in enumerate(draws):
            panel(axes[i][v + 1], ai[i], am[i], "red")
            if i == 0:
                axes[i][v + 1].set_title(f"draw {v}", fontsize=9)
    plt.tight_layout()
    out = os.path.abspath(args.output)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    plt.savefig(out, dpi=110)
    plt.close(fig)
    on = [k for k in ("use_elastic", "use_speckle", "use_tgc", "use_clahe")
          if getattr(args, k)] + (["p_crop"] if args.p_crop else [])
    print(f"wrote {n}x{ncols} preview grid ({', '.join(on) or 'baseline'}"
          f" augmentation) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

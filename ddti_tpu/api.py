"""High-level library API: the notebook/script-friendly facade over the
framework's Trainer/serving machinery.

The reference is driveable only through its CLI (`main.py`); every
programmatic use means wiring Config + logger + datasets + Trainer by
hand (/root/reference/main.py:93-157). This facade packages that wiring
into three calls:

    import ddti_tpu.api as ddti

    model = ddti.fit(images, masks, model_type="ResUNet",
                     base_filters=32, depth=4, epochs=20)
    masks_pred = model.predict(new_images)          # uint8 masks
    probs = model.predict(new_images, prob=True)    # soft probabilities
    model.save("run1")                              # .npz weights
    model = ddti.load("run1.npz", model_type="ResUNet",
                      base_filters=32, depth=4)

Arrays in, arrays out — numpy or jax, uint8 [0,255] or float [0,1],
(N, H, W) or (N, H, W, 1). Everything the train CLI can do is reachable
through keyword arguments (they are Config fields: ``use_mixup=True``,
``qat=True``, ``distill_checkpoint=...``, ``freeze="encoders"``, ...).
"""

from __future__ import annotations

import os
import tempfile
from dataclasses import fields as _dc_fields
from typing import Any, Optional

import numpy as np


def _as_nhwc_u8(arr, name: str) -> np.ndarray:
    """Accept (N,H,W) or (N,H,W,1), uint8 [0,255] or float [0,1] ->
    (N,H,W,1) uint8."""
    a = np.asarray(arr)
    if a.ndim == 3:
        a = a[..., None]
    if a.ndim != 4 or a.shape[-1] != 1:
        raise ValueError(f"{name}: expected (N,H,W) or (N,H,W,1) "
                         f"grayscale, got shape {a.shape}")
    if a.dtype != np.uint8:
        a = (np.clip(a.astype(np.float32), 0.0, 1.0) * 255.0 + 0.5
             ).astype(np.uint8)
    return a


class Model:
    """A trained (or loaded) segmentation model: thin state holder with
    ``predict``/``evaluate``/``save``/``export_serving``."""

    def __init__(self, flax_model, params, batch_stats, config,
                 qstats=None):
        self.model = flax_model
        self.params = params
        self.batch_stats = batch_stats
        self.config = config
        self.qstats = qstats
        self._predict_fn = None

    # -- inference ------------------------------------------------------

    def predict(self, images, batch_size: int = 32, prob: bool = False,
                threshold: float = 0.5, tta: bool = False) -> np.ndarray:
        """Masks for ``images`` at the model's training resolution:
        uint8 {0,1} maps (or float32 probabilities with ``prob=True``),
        shape (N, H, W). Batches internally; partial tails are padded to
        keep one compiled shape."""
        import jax
        import jax.numpy as jnp

        from ddti_tpu.data.augment import eval_preprocess

        x = _as_nhwc_u8(images, "images")
        size = int(self.config.image_size)
        variables = {"params": self.params,
                     "batch_stats": self.batch_stats}

        key = (batch_size, tta)
        if self._predict_fn is None or self._predict_fn[0] != key:
            def logits_fn(v, xb):
                xb = xb.astype(jnp.float32) / 255.0
                xb, _ = eval_preprocess(xb, xb, (size, size))

                def fwd(im):
                    out = self.model.apply(v, im, train=False)
                    return out[0] if isinstance(out, tuple) else out

                if tta:
                    from ddti_tpu.eval.tta import tta_logits
                    return tta_logits(fwd, xb)
                return fwd(xb)

            self._predict_fn = (key, jax.jit(logits_fn))
        fn = self._predict_fn[1]

        outs = []
        for i in range(0, len(x), batch_size):
            chunk = x[i:i + batch_size]
            pad = batch_size - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], np.uint8)])
            lg = fn(variables, jnp.asarray(chunk))
            p = np.asarray(jax.nn.sigmoid(lg.astype(jnp.float32)))
            outs.append(p[:len(x[i:i + batch_size])])
        probs = np.concatenate(outs)[..., 0]
        return probs if prob else (probs > threshold).astype(np.uint8)

    def evaluate(self, images, masks, batch_size: int = 32,
                 threshold: float = 0.5) -> dict:
        """Pixel metrics of ``predict(images)`` against ``masks``:
        {"iou", "f1", "precision", "recall", "acc"} (micro-averaged, the
        reference's test() convention)."""
        pred = self.predict(images, batch_size=batch_size,
                            threshold=threshold).astype(bool)
        gt_u8 = _as_nhwc_u8(masks, "masks")[..., 0]
        gt = gt_u8 > 127
        tp = float(np.logical_and(pred, gt).sum())
        fp = float(np.logical_and(pred, ~gt).sum())
        fn = float(np.logical_and(~pred, gt).sum())
        tn = float(np.logical_and(~pred, ~gt).sum())
        eps = 1e-8
        prec = tp / (tp + fp + eps)
        rec = tp / (tp + fn + eps)
        return {"iou": tp / (tp + fp + fn + eps),
                "f1": 2 * prec * rec / (prec + rec + eps),
                "precision": prec, "recall": rec,
                "acc": (tp + tn) / (tp + fp + fn + tn + eps)}

    # -- persistence / deployment --------------------------------------

    def save(self, path: str) -> str:
        """Write ``<path>.npz`` (weights + BN stats, plus QAT ranges when
        trained with qat=True) — loadable by ``ddti_tpu.api.load``, the
        infer/quantize/export CLIs, and `--checkpoint_path` warm starts."""
        from ddti_tpu.train.checkpoint import save_params_npz

        if not path.endswith(".npz"):
            path = path + ".npz"
        save_params_npz(path, self.params, self.batch_stats,
                        qstats=self.qstats)
        return path

    def export_serving(self, path: str, batch: int = 32,
                       dtype: str = "bf16", tta: bool = False,
                       threshold: float = 0.5,
                       min_channels: int = 0) -> str:
        """Write a deployable StableHLO bundle (program + sibling .npz):
        ``dtype`` in {"f32", "bf16", "int8"}. Servable by ``ddti-infer``,
        ``ddti-serve`` and ``train.export.load_serving_bundle``.
        ``min_channels`` (int8 only): quantize just the channel-heavy
        convs — use 128 at 512² (benchmarks/PERF_NOTES.md)."""
        import jax.numpy as jnp

        size = int(self.config.image_size)
        if not path.endswith("_serving_program.stablehlo"):
            path = path + "_serving_program.stablehlo"
        if dtype == "int8":
            from ddti_tpu.train.quantize import export_serving_int8

            amax = None
            if self.qstats:
                from ddti_tpu.train.qat import qstats_amax
                amax = qstats_amax(self.qstats) or None
            calib = None
            if amax is None:
                from ddti_tpu.data import generate_ddti_like
                im, _ = generate_ddti_like(min(batch, 32), (size, size), 0)
                calib = jnp.asarray(im, jnp.float32) / 255.0
            blob, svars = export_serving_int8(
                self.model, self.params, self.batch_stats, batch=batch,
                size=size, calib_images=calib, amax=amax,
                threshold=threshold, input_dtype=jnp.uint8, tta=tta,
                min_channels=min_channels)
        else:
            from ddti_tpu.train.export import export_serving_program

            blob, svars = export_serving_program(
                self.model, self.params, self.batch_stats, batch=batch,
                size=size, threshold=threshold, fold_bn=True,
                input_dtype=jnp.uint8,
                weights_dtype=jnp.bfloat16 if dtype == "bf16" else None,
                tta=tta)
        with open(path, "wb") as f:
            f.write(blob)
        from ddti_tpu.train.checkpoint import save_variables_npz
        save_variables_npz(os.path.splitext(path)[0] + ".npz", svars)
        return path


def _make_model(model_type: str, image_size: int, bf16: bool,
                **model_kwargs):
    import jax.numpy as jnp

    from ddti_tpu.models import create_model

    kwargs = dict(in_channels=1, out_channels=1)
    kwargs.update(model_kwargs)
    if bf16:
        kwargs["dtype"] = jnp.bfloat16
    if model_type == "TransUNet":
        kwargs.setdefault("image_size", image_size)
    return create_model(model_type, **kwargs)


def fit(images, masks, *, val_images=None, val_masks=None,
        model_type: str = "ResUNet", base_filters: int = 32,
        depth: int = 4, image_size: Optional[int] = None,
        epochs: int = 20, batch_size: int = 16, lr: float = 3e-4,
        bf16: bool = True, val_fraction: float = 0.15,
        run_dir: Optional[str] = None, verbose: bool = True,
        seed: int = 42, mesh: Optional[str] = None,
        **config_overrides: Any) -> Model:
    """Train a model on arrays. ``images``/``masks``: (N, H, W[, 1]),
    uint8 [0,255] or float [0,1]. Without an explicit val set, the last
    ``val_fraction`` of the (shuffled) data validates. Any further
    keyword becomes a Config field (``use_mixup=True``, ``qat=True``,
    ``freeze="encoders"``, ``distill_checkpoint=...``, ...). ``mesh``
    ("data=4" / "data=4,model=2") trains data-parallel (+ spatial)
    over the local devices, same as the CLI's --mesh. Returns the
    best-val-IoU weights."""
    import jax

    from ddti_tpu.core import Config, create_logger, set_seed
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.train import Trainer

    x = _as_nhwc_u8(images, "images")
    y = _as_nhwc_u8(masks, "masks")
    if len(x) != len(y):
        raise ValueError(f"{len(x)} images vs {len(y)} masks")
    size = int(image_size or x.shape[1])

    if val_images is None:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(x))
        n_val = max(1, int(round(len(x) * val_fraction)))
        val_idx, tr_idx = order[:n_val], order[n_val:]
        xv, yv = x[val_idx], y[val_idx]
        x, y = x[tr_idx], y[tr_idx]
    else:
        xv = _as_nhwc_u8(val_images, "val_images")
        yv = _as_nhwc_u8(val_masks, "val_masks")

    own_tmp = run_dir is None
    base_dir = run_dir or tempfile.mkdtemp(prefix="ddti_fit_")
    valid = {f.name for f in _dc_fields(Config)}
    bad = sorted(set(config_overrides) - valid)
    if bad:
        raise TypeError(f"unknown fit() keyword(s): {bad} "
                        "(must be Config fields)")
    cfg = Config(model_type=model_type, epochs=epochs,
                 batch_size=min(batch_size, len(x)), lr=lr,
                 image_size=size, store_size=x.shape[1],
                 use_amp_autocast=bf16, base_dir=base_dir, seed=seed,
                 **config_overrides)
    cfg.model_kwargs = dict(base_filters=base_filters, depth=depth)
    set_seed(seed)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"),
                           console=verbose)

    model = _make_model(model_type, size, bf16,
                        base_filters=base_filters, depth=depth)
    device_mesh = None
    if mesh:
        import jax as _jax

        from ddti_tpu.parallel import make_mesh, parse_mesh_spec
        spec = parse_mesh_spec(mesh)
        n = int(np.prod(list(spec.values())))
        # library convenience: a smaller mesh takes the first n devices
        # (the CLI requires the spec to cover every device exactly)
        device_mesh = make_mesh(spec, _jax.devices()[:n])
    train_src = DeviceDataSource(x, y)
    val_src = DeviceDataSource(xv, yv)
    trainer = Trainer(cfg, (train_src, val_src, val_src), logger, model,
                      mesh=device_mesh)
    trainer.train()

    # the best-val-IoU weights (saved every improvement); fall back to
    # the live (last) state if no epoch improved
    best = os.path.join(cfg.model_dir, f"{model_type}_best.npz")
    params, stats = trainer._eval_weights()
    qstats = getattr(trainer.state, "qstats", None)
    if os.path.exists(best):
        from ddti_tpu.train.checkpoint import load_params_npz, load_qstats
        params, stats = load_params_npz(best, params, stats)
        if qstats is not None:
            saved = load_qstats(best)
            if saved:
                qstats = {k: np.float32(v) for k, v in saved.items()}
    result = Model(model, params, stats, cfg,
                   qstats=jax.device_get(qstats)
                   if qstats is not None else None)
    if own_tmp and not verbose:
        import shutil
        shutil.rmtree(base_dir, ignore_errors=True)
    return result


def load(checkpoint: str, *, model_type: str = "ResUNet",
         base_filters: int = 32, depth: int = 4, image_size: int = 256,
         bf16: bool = True, **model_kwargs) -> Model:
    """Load any checkpoint form (``.npz``, Orbax dir, reference ``.pth``)
    into a ``Model`` ready to ``predict``/``evaluate``/``export_serving``.
    Architecture flags must match the checkpoint (same contract as the
    infer CLI)."""
    import jax
    import jax.numpy as jnp

    from ddti_tpu.core import Config
    from ddti_tpu.train.checkpoint import load_checkpoint_into, load_qstats

    model = _make_model(model_type, image_size, bf16,
                        base_filters=base_filters, depth=depth,
                        **model_kwargs)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, image_size, image_size, 1)),
                           train=False)
    params, stats = load_checkpoint_into(
        checkpoint, model_type, variables["params"],
        variables.get("batch_stats", {}))
    cfg = Config(model_type=model_type, image_size=image_size,
                 store_size=image_size)
    cfg.model_kwargs = dict(base_filters=base_filters, depth=depth)
    qstats = None
    try:
        saved = load_qstats(checkpoint)
        if saved:
            qstats = {k: np.float32(v) for k, v in saved.items()}
    except Exception:
        pass
    return Model(model, params, stats, cfg, qstats=qstats)

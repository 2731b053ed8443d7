"""Experiment configuration: flags, YAML model matrix, run directories.

Mirrors the reference's two config planes and makes the dead one live:
 - the 25 CLI flags of /root/reference/main.py:17-64 (same names/defaults);
 - the YAML model-matrix entries ``{model: {model_type, kwargs}}`` consumed
   via ``--config_path`` (the reference parses but never uses this,
   /root/reference/main.py:110-140 — here it actually dispatches the model).

Run-directory behavior matches /root/reference/utils/utils.py:15-45:
``experiments/<ModelType>_<YYYYmmdd_HHMMSS>/{models,log,result}`` with
Asia/Shanghai timestamps and a resolved-config YAML snapshot.
"""

from __future__ import annotations

import dataclasses
import os
from datetime import datetime, timezone
from typing import Optional

import yaml

try:
    from zoneinfo import ZoneInfo
    _SHANGHAI = ZoneInfo("Asia/Shanghai")
except Exception:  # pragma: no cover
    _SHANGHAI = timezone.utc


@dataclasses.dataclass
class Config:
    """All experiment knobs. Field names follow the reference flags."""

    # dataset
    dataset_path: str = "data/dataset"
    dataset: str = "DDTI"
    checkpoint_path: str = ""
    config_path: Optional[str] = None

    # augmentation
    p_crop: float = 0.0
    use_elastic: bool = False
    use_speckle: bool = False
    use_tgc: bool = False
    use_clahe: bool = False
    use_mixup: bool = False
    mixup_alpha: float = 0.2
    mixup_prob: float = 0.3
    # one flip/rotation draw per BATCH instead of per image: ~11x faster
    # warp gather on TPU, batch-correlated geometry (QUIRKS.md divergence)
    aug_shared_geometry: bool = False
    # Paeth three-shear warp: no gather, per-image geometry preserved,
    # ~15% faster flagship train step. DEFAULT ON since round 5: a 3-seed
    # training study measured held-out IoU statistically indistinguishable
    # from the exact PIL map (0.9728+-0.0029 vs 0.9700+-0.0068, QUIRKS.md
    # #23), so the recommended path is the fast one. Set False (CLI:
    # --aug_exact_warp) for bit-parity with the reference's
    # TF.rotate/PIL-nearest rotation (sub-pixel rounding divergence only;
    # exact at 0/90/180/270 and for pure flips).
    aug_fast_warp: bool = True

    # model
    model_type: str = "ResUNet"
    model_kwargs: dict = dataclasses.field(default_factory=dict)

    # loss weights
    bce_ratio: float = 1.0
    dice_ratio: float = 0.0
    focal_ratio: float = 1.0
    boundary_ratio: float = 0.0

    # training
    num_workers: int = 4          # kept for API parity; host loader only
    epochs: int = 10000
    batch_size: int = 16
    lr: float = 1e-5
    weight_decay: float = 1e-2    # parsed-but-unused in the reference; the
    # torch AdamW default (0.01) applied regardless — we reproduce that.
    grad_accum: int = 1           # microbatches per optimizer step: grads
    # are averaged over grad_accum sequential microbatches of
    # batch_size/grad_accum before ONE update (BN normalizes per
    # microbatch, EMA chained). Fits large effective batches in HBM.
    clip_grad_norm: float = 0.0   # >0: global-norm gradient clipping ahead
    # of AdamW (optax.clip_by_global_norm); 0 = reference parity (bare AdamW)
    nan_guard: bool = False        # reject non-finite train steps on device
    # (state kept, metrics zeroed); training stops gracefully after
    # nan_guard_patience consecutive rejections
    nan_guard_patience: int = 5
    save_interval: int = 20
    async_best_save: bool = True  # write best-epoch artifacts on a
    # background thread (donation-safe on-device snapshots): the ~40 s
    # flagship-scale fetch+write overlaps the next epochs instead of
    # blocking the step loop; train() joins before anything reads the
    # files. False = blocking writes (strict log ordering).
    best_full_state: bool = False  # also write the Orbax full-train-state
    # checkpoint at every best-IoU epoch (resume-from-best with optimizer
    # state). Default off: best epochs write the .npz weight export (+.pth)
    # only — the full state is 3x the bytes (params + both AdamW moments:
    # 1.56 GB at flagship scale, ~90 s through a 20 MB/s transfer path per
    # improvement epoch, benchmarks/ckpt_fetch_ab.py) and <Model>_last
    # always carries the resumable full state. Matches the reference's
    # weights-only best policy (/root/reference/utils/trainer.py:184-195).
    log_every: int = 20  # in-epoch INFO progress interval (steps); 0 = off
    profile_steps: int = 0  # capture an XLA device trace of the first N
    # train steps of epoch 1 into <result_dir>/trace (TensorBoard-viewable;
    # core/profiling.py). Stepwise path only — incompatible with
    # --fused_epoch's one-program epochs.
    max_keep_checkpoints: int = 3  # rotation depth of periodic checkpoints
    export_serving: bool = False   # write a StableHLO serving artifact
    # comma list of batch shapes for the export (e.g. "1,8,128"): one
    # bundle per shape — the multi-program serving set; None = batch_size
    serving_batches: str | None = None
    serving_dtype: str = "f32"     # exported bundle precision (f32|bf16|int8)
    quant_min_channels: int = 0    # int8: only quantize convs with
                                   # max(cin,cout) >= this (128 for 512^2)
    qat: bool = False  # quantization-aware training (train/qat.py):
    # fake-quantized conv forwards (STE) + activation-range EMA; int8
    # exports then use the learned ranges instead of one-batch calibration
    qat_ema_decay: float = 0.99  # amax EMA decay per step under --qat
    # knowledge distillation (train/distill.py): a frozen teacher
    # checkpoint supervises the student through a tempered per-pixel BCE
    distill_checkpoint: str = ""   # Orbax dir / .npz / reference .pth
    distill_model_type: str = ""   # teacher arch ("" = same as student)
    distill_base_filters: int = 0  # teacher width (0 = student's)
    distill_depth: int = 0         # teacher depth (0 = student's)
    distill_kwargs: str = ""  # JSON dict of extra teacher create_model
    # kwargs (e.g. '{"num_heads": 4, "batch_axis_attention": true}') —
    # behavior-only kwargs don't change param shapes, so a mismatch loads
    # fine but computes the WRONG teacher; always pass what the teacher
    # trained with
    distill_weight: float = 0.5    # KD share of the total loss [0, 1]
    distill_temperature: float = 2.0  # sigmoid softening temperature
    # fine-tuning: comma list of param-path prefixes to freeze (no
    # updates, no weight decay, no moment buffers) — e.g.
    # "encoders,bottleneck" trains only the decoder head
    freeze: str = ""
    freeze_bn_stats: bool = False  # also pin frozen modules' BN running
    # stats (default: BN-adapt — stats keep tracking the new data)
    early_stop_patience: int = 50
    alpha: float = 2.0
    ema_decay: float = 0.0  # >0 keeps an exponential-moving-average
    # shadow of the params (ema <- d*ema + (1-d)*params after every
    # optimizer step); validation/test/serving then use the EMA weights
    tune_threshold: bool = False  # sweep the binarization threshold on
    # the VAL split (one device pass over a 19-point grid) and run test()
    # at the argmax-IoU operating point instead of the fixed 0.5
    tta: bool = False  # 4-way flip test-time augmentation at test/serving:
    # mean sigmoid over {identity, h, v, hv} flips (eval/tta.py); applies
    # to Trainer.test() and any serving artifact exported by the run
    surface_metrics: bool = True  # per-image HD95/ASSD surface distances
    # in Trainer.test() (eval/surface.py, on-device EDT) — contour-quality
    # metrics the reference's pixel-overlap-only report lacks

    # parallel / precision (TPU-native additions; reference analogues:
    # use_data_parallel -> DataParallel, use_amp_autocast -> AMP)
    use_data_parallel: bool = True
    use_amp_autocast: bool = False  # on TPU: bf16 compute policy
    image_size: int = 512
    store_size: int = 512
    seed: int = 42
    host_augment: bool = False     # strict host-oracle augmentation path
    mesh_shape: Optional[dict] = None  # e.g. {"data": 8}
    fused_epoch: bool = False  # whole epoch as one scanned XLA program
    # two-pass (torch-numerics) BatchNorm variance — exact gradient parity
    # with the reference at ~5% train cost (QUIRKS #24)
    bn_exact_variance: bool = False
    donate_state: bool = True
    compute_unused_losses: bool = True  # reference computes all 4 terms

    # run dirs (filled by make_dirs)
    base_dir: str = "experiments"
    cfg_dir: str = ""
    model_dir: str = ""
    log_dir: str = ""
    result_dir: str = ""

    def make_dirs(self) -> None:
        os.makedirs(self.base_dir, exist_ok=True)
        ts = datetime.now(timezone.utc).astimezone(_SHANGHAI)
        self.cfg_dir = os.path.join(
            self.base_dir, f"{self.model_type}_{ts.strftime('%Y%m%d_%H%M%S')}")
        self.model_dir = os.path.join(self.cfg_dir, "models")
        self.log_dir = os.path.join(self.cfg_dir, "log")
        self.result_dir = os.path.join(self.cfg_dir, "result")
        for d in (self.cfg_dir, self.model_dir, self.log_dir,
                  self.result_dir):
            os.makedirs(d, exist_ok=True)
        self.save_snapshot()

    def save_snapshot(self) -> None:
        path = os.path.join(self.cfg_dir, "config.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(dataclasses.asdict(self), f, sort_keys=False)

    def apply_model_yaml(self, path: Optional[str] = None) -> None:
        """Load a ``{model: {model_type, kwargs}}`` YAML (one sweep entry as
        written by the config splitter) and dispatch the model from it."""
        path = path or self.config_path
        if not path:
            return
        if not os.path.isfile(path):
            raise FileNotFoundError(f"config file not found: {path}")
        with open(path) as f:
            doc = yaml.safe_load(f)
        if not isinstance(doc, dict):
            # e.g. the UNSPLIT 70-entry sweep matrix (a YAML list) or an
            # empty file — fail with a usable message instead of a raw
            # AttributeError
            raise ValueError(
                f"{path} is not a single-run config (got "
                f"{type(doc).__name__}); split the sweep matrix first: "
                f"python -m ddti_tpu.cli.split_config <matrix.yaml> <dir>")
        model = doc.get("model", {})
        if "model_type" in model:
            self.model_type = model["model_type"]
        self.model_kwargs = dict(model.get("kwargs", {}))

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        valid = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in valid})

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

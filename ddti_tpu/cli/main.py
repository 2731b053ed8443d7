"""CLI entry point — the ``python main.py`` equivalent.

Mirrors the 25 flags of /root/reference/main.py:17-64 (same names and
defaults) plus TPU-native additions, and implements the *intended* behavior
the reference left dead: live ``--config_path`` YAML model dispatch
(/root/reference/main.py:110-140) and a working ``--mode train|test|both``
(the reference hardcodes ResUNet and comments out ``trainer.train()``).

Usage:
  python -m ddti_tpu.cli.main --mode both --model_type ResUNet ...
  python -m ddti_tpu.cli.main --config_path config/ResUNet/config1.yaml
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes", "y", "t"):
        return True
    if v.lower() in ("false", "0", "no", "n", "f"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def _batch_size_arg(v: str):
    """int, or the literal 'auto' (resolved in main() once the model and
    mesh are known, via train/autobatch.pick_batch_size)."""
    if isinstance(v, int):
        return v
    if v.strip().lower() == "auto":
        return "auto"
    try:
        return int(v)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected an integer or 'auto', got {v!r}")


def parse_remat_arg(v):
    """--remat value -> the models' ``remat`` kwarg: True (bare flag) or a
    tuple of level indices parsed from a comma list ('0,1' -> (0, 1)).
    Used as the argparse ``type`` so malformed values fail as usage errors
    at parse time, before any setup work."""
    if v in (True, False, None):
        return bool(v)
    try:
        levels = tuple(sorted({int(t) for t in str(v).split(",") if t.strip()}))
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"--remat expects no value or a comma list of level indices "
            f"(e.g. 0,1), got {v!r}")
    if not levels:  # e.g. '--remat ,' — reject rather than silently
        raise argparse.ArgumentTypeError(  # enabling full remat
            f"--remat got an empty level list: {v!r}")
    if any(l < 0 for l in levels):
        raise argparse.ArgumentTypeError(
            f"--remat level indices must be >= 0, got {v!r}")
    return levels


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)

    # dataset config
    p.add_argument("--dataset_path", default="data/dataset", type=str)
    p.add_argument("--dataset", default="DDTI", type=str)
    p.add_argument("--checkpoint_path", default="", type=str)
    p.add_argument("--config_path", default=None, type=str)

    # data augmentation config
    p.add_argument("--p_crop", default=0, type=float)
    p.add_argument("--use_elastic", action="store_true")
    p.add_argument("--use_speckle", action="store_true")
    p.add_argument("--use_tgc", action="store_true")
    p.add_argument("--use_clahe", action="store_true")
    p.add_argument("--use_mixup", action="store_true")
    p.add_argument("--mixup_alpha", type=float, default=0.2)
    p.add_argument("--mixup_prob", type=float, default=0.3)
    p.add_argument("--aug_shared_geometry", action="store_true",
                   help="one flip/rotation draw per batch (TPU-fast warp; "
                        "diverges from the reference's per-image draws)")
    p.add_argument("--aug_fast_warp", action="store_true", default=True,
                   help="Paeth three-shear flip+rotate (no gather, ~9x "
                        "faster warp, per-image geometry kept; sub-pixel "
                        "nearest-rounding divergence from PIL, QUIRKS #23). "
                        "DEFAULT ON since the 3-seed IoU-equivalence study; "
                        "this flag is kept as a no-op for compatibility")
    p.add_argument("--aug_exact_warp", dest="aug_fast_warp",
                   action="store_false",
                   help="exact PIL-map flip+rotate (bit-parity with the "
                        "reference's TF.rotate; per-element gather warp, "
                        "~15%% slower flagship step)")

    # model config
    p.add_argument("--model_type", default="ResUNet", type=str)
    p.add_argument("--base_filters", default=64, type=int)
    p.add_argument("--depth", default=5, type=int)
    p.add_argument("--in_channels", default=1, type=int)
    p.add_argument("--out_channels", default=1, type=int)

    # loss config
    p.add_argument("--bce_ratio", type=float, default=1)
    p.add_argument("--dice_ratio", type=float, default=0)
    p.add_argument("--focal_ratio", type=float, default=1)
    p.add_argument("--boundary_ratio", type=float, default=0)

    # train config
    p.add_argument("--num_workers", default=4, type=int)
    p.add_argument("--epochs", type=int, default=10000)
    p.add_argument("--batch_size", default=16, type=_batch_size_arg,
                   help="per-step global batch, or 'auto': probe XLA's "
                        "compile-time memory plan (no allocation, no "
                        "steps) and pick the largest power-of-two-ish "
                        "batch that fits HBM (train/autobatch.py)")
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--weight_decay", type=float, default=1e-2)
    p.add_argument("--save_interval", default=20, type=int)
    p.add_argument("--log_every", default=20, type=int,
                   help="in-epoch progress interval in steps (loss + "
                        "img/s, the tqdm-equivalent); 0 disables")
    p.add_argument("--profile", dest="profile_steps", default=0, type=int,
                   help="capture an XLA device trace of the first N train "
                        "steps into <result_dir>/trace (view in "
                        "TensorBoard); 0 disables")
    p.add_argument("--max_keep_checkpoints", default=3, type=int,
                   help="rotation depth of the periodic checkpoint manager")
    p.add_argument("--early_stop_patience", default=50, type=int)
    p.add_argument("--alpha", type=float, default=2)

    # other config (reference: use_data_parallel / use_amp_autocast).
    # The reference declares these as type=bool, so `--use_data_parallel
    # False` parses TRUTHY (bool("False") is True, /root/reference/main.py:
    # 59-60). We accept real booleans instead (QUIRKS #19).
    p.add_argument("--use_data_parallel", type=_str2bool, default=True,
                   help="shard the batch over all local devices")
    p.add_argument("--use_amp_autocast", type=_str2bool, default=False,
                   help="bf16 compute policy on TPU")

    # TPU-native additions
    p.add_argument("--mesh", default=None, type=str,
                   help="explicit device mesh, e.g. 'data=4,model=2' — "
                        "'data' shards the batch (DP), 'model' spatially "
                        "partitions H (GSPMD inserts the conv halo "
                        "exchanges); overrides --use_data_parallel")
    p.add_argument("--native_loader", default="auto",
                   choices=["auto", "on", "off"],
                   help="stream train batches through the C++ threaded "
                        "mmap loader instead of a device-resident store; "
                        "auto = when the train store exceeds 2 GiB "
                        "(too large to pin in HBM alongside training)")
    p.add_argument("--multihost", action="store_true",
                   help="join a multi-host (DCN) run via "
                        "jax.distributed.initialize before device use")
    p.add_argument("--coordinator", default=None,
                   help="coordinator host:port (env "
                        "JAX_COORDINATOR_ADDRESS; omit on TPU pods)")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total process count (env JAX_NUM_PROCESSES)")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's rank (env JAX_PROCESS_ID)")
    p.add_argument("--serving_dtype", choices=["f32", "bf16", "int8"],
                   default="f32",
                   help="exported serving bundle precision; bf16 halves the "
                        ".npz (throughput identical — weight prefetch "
                        "overlaps compute); int8 quantizes every conv to "
                        "the MXU's s8 path (per-channel weights, one-batch "
                        "activation calibration, ~4x smaller bundle; "
                        "train/quantize.py)")
    p.add_argument("--quant_min_channels", type=int, default=0,
                   help="int8 serving: quantize only convs with "
                        "max(cin,cout) >= this (mixed precision; 128 "
                        "recommended at 512^2 — PERF_NOTES.md)")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware training: fake-quantized conv "
                        "forwards (per-channel int8 weights, per-tensor "
                        "activations, STE gradients) + activation-range "
                        "EMA; --serving_dtype int8 exports then use the "
                        "learned ranges instead of one-batch calibration "
                        "(train/qat.py; respects --quant_min_channels)")
    p.add_argument("--qat_ema_decay", type=float, default=0.99,
                   help="per-step decay of the QAT activation-range EMA")
    p.add_argument("--distill_checkpoint", default="", type=str,
                   help="knowledge distillation (train/distill.py): a "
                        "trained teacher checkpoint (Orbax dir / .npz / "
                        "reference .pth) whose frozen forward supervises "
                        "the student through a tempered per-pixel BCE, "
                        "fused into the train step")
    p.add_argument("--distill_model_type", default="", type=str,
                   help="teacher architecture (default: --model_type)")
    p.add_argument("--distill_base_filters", default=0, type=int,
                   help="teacher base_filters (default: --base_filters)")
    p.add_argument("--distill_depth", default=0, type=int,
                   help="teacher depth (default: --depth)")
    p.add_argument("--distill_kwargs", default="", type=str,
                   help="JSON dict of extra teacher create_model kwargs "
                        "(e.g. '{\"num_heads\": 4}') — REQUIRED when the "
                        "teacher trained with non-default behavior-only "
                        "kwargs: they don't change param shapes, so a "
                        "mismatch loads fine but computes the wrong "
                        "teacher")
    p.add_argument("--distill_weight", default=0.5, type=float,
                   help="KD share of the total loss: total = (1-w)*ground"
                        "-truth composite + w*KD (1.0 = teacher only)")
    p.add_argument("--distill_temperature", default=2.0, type=float,
                   help="sigmoid softening temperature for the KD term")
    p.add_argument("--freeze", default="", type=str,
                   help="fine-tuning: comma list of param-path prefixes "
                        "to freeze (no updates, no weight decay) — e.g. "
                        "'encoders,bottleneck' trains only the decoder; "
                        "pair with --checkpoint_path to fine-tune a "
                        "pretrained model (incl. reference .pth)")
    p.add_argument("--freeze_bn_stats", action="store_true",
                   help="also pin frozen modules' BatchNorm running "
                        "stats (default: BN-adapt — stats keep tracking "
                        "the fine-tuning data)")
    p.add_argument("--serving_batches", default=None, type=str,
                   help="comma list of batch shapes for --export_serving "
                        "(e.g. 1,8,128): one bundle per shape, servable "
                        "together by cli/serve as a multi-program set")
    p.add_argument("--export_serving", action="store_true",
                   help="after training, write a StableHLO serving artifact "
                        "(weights baked in, loadable without model code)")
    p.add_argument("--async_best_save", type=_str2bool, default=True,
                   help="write best-epoch artifacts on a background "
                        "thread (overlaps the ~40 s flagship-scale "
                        "fetch+write with training); false = blocking")
    p.add_argument("--best_full_state", action="store_true",
                   help="also write the Orbax full-train-state checkpoint "
                        "at best-IoU epochs (resume-from-best with "
                        "optimizer state). Default: best epochs write the "
                        ".npz weight export only — 3x fewer bytes per "
                        "improvement epoch; <Model>_last stays resumable")
    p.add_argument("--tune_threshold", action="store_true",
                   help="pick the mask binarization threshold maximizing "
                        "val IoU (19-point device sweep) and test with it "
                        "instead of the fixed 0.5")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="exponential-moving-average shadow of the params "
                        "(e.g. 0.999), updated inside the jitted step; "
                        "validation/test/serving use the EMA weights")
    p.add_argument("--tta", action="store_true",
                   help="4-way flip test-time augmentation: Trainer.test() "
                        "and exported serving artifacts average sigmoid "
                        "probabilities over {identity, h, v, hv} flips "
                        "(4 fused forward passes, eval/tta.py)")
    p.add_argument("--lr_find", type=int, default=0, metavar="N",
                   help="run an N-step learning-rate range test instead "
                        "of training (geometric ramp --lr_find_min.."
                        "--lr_find_max on the real train step; curve + "
                        "suggestions into result/, then exit)")
    p.add_argument("--lr_find_min", type=float, default=1e-7)
    p.add_argument("--lr_find_max", type=float, default=1.0)
    p.add_argument("--surface_metrics", default=True, type=_str2bool,
                   help="per-image HD95/ASSD surface distances in "
                        "Trainer.test() (on-device EDT, eval/surface.py); "
                        "False skips the extra device program")
    p.add_argument("--mode", default="test", choices=["train", "test", "both"],
                   help="the reference's checked-in behavior is test-only")
    p.add_argument("--host_augment", action="store_true",
                   help="strict-parity mode: run the PIL/cv2 host "
                        "augmentation chain (reference oracle) instead of "
                        "the on-device pipeline")
    p.add_argument("--grad_accum", default=1, type=int,
                   help="microbatches per optimizer step: each train step "
                        "scans batch_size/grad_accum-sized microbatches, "
                        "averages their gradients and applies ONE update — "
                        "peak activation memory is the microbatch's, so "
                        "effective batches that OOM in one shot fit "
                        "(BatchNorm normalizes per microbatch, like torch "
                        "accumulation loops)")
    p.add_argument("--clip_grad_norm", default=0.0, type=float,
                   help="clip gradients to this global L2 norm before the "
                        "AdamW update (optax.clip_by_global_norm); 0 "
                        "disables (reference parity — its optimizer is "
                        "bare AdamW)")
    p.add_argument("--nan_guard", action="store_true",
                   help="reject train steps whose loss or gradients are "
                        "non-finite: the update is skipped on device (the "
                        "whole train state, including the step counter, is "
                        "kept), the step contributes nothing to epoch "
                        "metrics, and training stops gracefully after "
                        "--nan_guard_patience consecutive rejections")
    p.add_argument("--nan_guard_patience", default=5, type=int,
                   help="consecutive non-finite steps tolerated under "
                        "--nan_guard before training stops")
    p.add_argument("--bn_exact_variance", action="store_true",
                   help="compute BatchNorm batch variance two-pass "
                        "(E[(x-mu)^2], torch numerics) instead of flax's "
                        "one-pass E[x^2]-E[x]^2: exact gradient-level "
                        "parity with the reference (QUIRKS #24) at ~5%% "
                        "train throughput cost")
    p.add_argument("--fused_epoch", action="store_true",
                   help="run each training epoch as ONE scanned XLA "
                        "program (dataset resident in HBM, a single "
                        "dispatch per epoch). Caveats: --profile is "
                        "ignored (no per-step trace boundaries) and "
                        "--nan_guard degrades to epoch granularity — "
                        "rejected steps are still skipped on device, but "
                        "training only stops when a WHOLE epoch is "
                        "rejected, not after --nan_guard_patience bad "
                        "steps (both warned at epoch 0)")
    p.add_argument("--remat", nargs="?", const=True, default=False,
                   type=parse_remat_arg, metavar="LEVELS",
                   help="rematerialize conv-block activations in the "
                        "backward pass (fits f32 512x512 batch-16 training "
                        "on one 16GB chip). Bare --remat remats every "
                        "block; an optional comma list of level indices "
                        "(--remat 0,1; 0 = highest resolution) remats only "
                        "those encoder/decoder levels — most of the memory "
                        "back at a fraction of the recompute")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the axon sitecustomize pins "
                        "the TPU tunnel; env vars alone cannot override it)")
    p.add_argument("--compilation_cache", default="auto", type=str,
                   help="persistent XLA compilation cache directory; repeat "
                        "runs of the same shapes skip the 30-60s TPU "
                        "compiles (measured 3-5x faster cold start). "
                        "'auto' = $DDTI_COMPILATION_CACHE or "
                        "~/.cache/ddti_tpu/xla_cache; 'off' disables")
    p.add_argument("--resume", action="store_true",
                   help="restore the full train state (params, optimizer, "
                        "step) from --checkpoint_path before training — "
                        "unlike the reference's weights-only warm start")
    p.add_argument("--image_size", default=512, type=int)
    p.add_argument("--store_size", default=512, type=int)
    p.add_argument("--seed", default=42, type=int)
    p.add_argument("--synthetic", action="store_true",
                   help="run on generated DDTI-like data (no dataset needed)")
    p.add_argument("--base_dir", default="experiments", type=str)
    return p


def build_config(args: argparse.Namespace):
    from ddti_tpu.core import Config

    fields = {f.name for f in dataclasses.fields(Config)}
    cfg = Config(**{k: v for k, v in vars(args).items() if k in fields})
    cfg.model_kwargs = dict(
        in_channels=args.in_channels, out_channels=args.out_channels,
        base_filters=args.base_filters, depth=args.depth)
    if args.config_path:
        cfg.apply_model_yaml(args.config_path)
    return cfg


NATIVE_AUTO_BYTES = 2 << 30  # stores past this stream via the C++ loader


def load_sources(cfg, native: str = "auto"):
    """Build the three data sources (train/val/test).

    Val/test are always device-resident stores; the TRAIN split streams
    through the native C++ threaded mmap loader (runtime/host_loader.cpp)
    when ``native`` is "on", or "auto" and the store is too large to pin
    in HBM alongside training — the TPU-native equivalent of the
    reference's DataLoader worker processes
    (/root/reference/data/data_loader.py:29-33)."""
    from ddti_tpu.data import (
        DeviceDataSource,
        MedicalDataset,
        decode_to_store,
        decode_to_store_files,
        generate_ddti_like,
    )

    size = (cfg.store_size, cfg.store_size)
    sources = []
    root = cfg.dataset_path
    have_disk = all(
        os.path.isdir(os.path.join(root, s)) for s in ("train", "val", "test"))
    if have_disk:
        cache = os.path.join(root, ".store_cache")
        for split in ("train", "val", "test"):
            ds = MedicalDataset(os.path.join(root, split),
                                os.path.join(root, f"{split}_mask"))
            use_native = split == "train" and (
                native == "on"
                or (native == "auto" and len(ds) * size[0] * size[1]
                    > NATIVE_AUTO_BYTES))
            if use_native:
                from ddti_tpu.runtime import NativeBatchLoader, NativeSource
                ip, mp, n = decode_to_store_files(ds, size, cache_dir=cache)
                sources.append(NativeSource(NativeBatchLoader(
                    ip, mp, n, size[0], size[1], cfg.batch_size,
                    seed=cfg.seed)))
            else:
                sources.append(DeviceDataSource(
                    *decode_to_store(ds, size, cache_dir=cache),
                    names=ds.img_names))
    else:
        for n, seed in ((64, 0), (16, 10_000), (16, 20_000)):
            sources.append(DeviceDataSource(*generate_ddti_like(
                n, size, cfg.seed + seed)))
    return tuple(sources)


def load_host_sources(cfg, synthetic: bool = False):
    """Strict-parity sources: MedicalDataset + the PIL/cv2 host chain in
    single-process HostBatchIterators (the reference's data path, minus the
    worker processes)."""
    import tempfile

    from ddti_tpu.data import HostBatchIterator, MedicalDataset
    from ddti_tpu.data.host_transforms import build_eval_chain, build_train_chain
    from ddti_tpu.data.synthetic import write_synthetic_dataset

    root = cfg.dataset_path
    if synthetic or not os.path.isdir(os.path.join(root, "train")):
        root = os.path.join(tempfile.gettempdir(), "ddti_synth_host")
        if not os.path.isdir(os.path.join(root, "train")):
            write_synthetic_dataset(root, n_train=64, n_val=16, n_test=16,
                                    size=(cfg.store_size, cfg.store_size),
                                    seed=cfg.seed)
    out = (cfg.image_size, cfg.image_size)
    train_tf = build_train_chain(cfg.use_elastic, cfg.use_speckle,
                                 cfg.use_tgc, cfg.use_clahe, out)
    eval_tf = build_eval_chain(out)
    sources = []
    for split, tf, shuffle in (("train", train_tf, True),
                               ("val", eval_tf, False),
                               ("test", eval_tf, True)):
        ds = MedicalDataset(os.path.join(root, split),
                            os.path.join(root, f"{split}_mask"), tf)
        sources.append(HostBatchIterator(ds, cfg.batch_size, shuffle,
                                         seed=cfg.seed))
    return tuple(sources)


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ddti_tpu.core import enable_compilation_cache
    enable_compilation_cache(args.compilation_cache)

    if args.multihost:
        # join the global runtime BEFORE first device use; after this,
        # jax.devices() spans every host and the mesh/pjit path is
        # unchanged (DP collectives ride ICI within a slice, DCN across)
        from ddti_tpu.parallel import initialize_multihost, spec_from
        initialize_multihost(spec_from(args.coordinator,
                                       args.num_processes,
                                       args.process_id))

    from ddti_tpu.core import create_logger, set_seed
    from ddti_tpu.models import create_model
    from ddti_tpu.train import Trainer, count_params, restore_checkpoint

    cfg = build_config(args)
    set_seed(cfg.seed)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))

    model_kwargs = dict(cfg.model_kwargs)
    if cfg.use_amp_autocast:
        import jax.numpy as jnp
        model_kwargs["dtype"] = jnp.bfloat16
    if args.remat:
        model_kwargs["remat"] = args.remat  # parsed by type=parse_remat_arg
    if cfg.model_type == "TransUNet":
        model_kwargs.setdefault("image_size", cfg.image_size)
    model = create_model(cfg.model_type, **model_kwargs)

    mesh = None
    if args.mesh:
        from ddti_tpu.parallel import make_mesh, parse_mesh_spec
        cfg.mesh_shape = parse_mesh_spec(args.mesh)
        mesh = make_mesh(cfg.mesh_shape)
        logger.info(f"Using explicit mesh {cfg.mesh_shape} over "
                    f"{len(jax.devices())} devices...")
    elif cfg.use_data_parallel and len(jax.devices()) > 1:
        from ddti_tpu.parallel import make_mesh
        mesh = make_mesh()
        logger.info(f"Using {len(jax.devices())} devices for training...")

    if cfg.batch_size == "auto":
        # probe the compile-time memory plan for the largest fitting
        # batch BEFORE sources exist (batching happens at iteration time)
        from ddti_tpu.train.autobatch import pick_batch_size
        dp = mesh.shape.get("data", 1) if mesh is not None else 1
        cfg.batch_size = pick_batch_size(
            cfg, model, data_parallel=dp,
            host_augment=bool(args.host_augment), logger=logger)
        logger.info(f"[autobatch] selected --batch_size {cfg.batch_size}"
                    + (f" (global over data={dp})" if dp > 1 else ""))

    if args.host_augment:
        sources = load_host_sources(cfg, synthetic=args.synthetic)
    elif args.synthetic:
        from ddti_tpu.data import DeviceDataSource, generate_ddti_like
        size = (cfg.store_size, cfg.store_size)
        sources = tuple(
            DeviceDataSource(*generate_ddti_like(n, size, cfg.seed + s))
            for n, s in ((64, 0), (16, 10_000), (16, 20_000)))
    else:
        sources = load_sources(cfg, native=args.native_loader)

    trainer = Trainer(cfg, sources, logger, model, mesh=mesh)

    if ((args.resume or cfg.checkpoint_path)
            and not os.path.exists(cfg.checkpoint_path or "")):
        # an explicitly requested warm start / resume must not silently
        # fall through to a fresh random init
        raise FileNotFoundError(
            f"--checkpoint_path {cfg.checkpoint_path!r} does not exist"
            + (" (required by --resume)" if args.resume else ""))
    if cfg.checkpoint_path and os.path.exists(cfg.checkpoint_path):
        if cfg.checkpoint_path.endswith(".pth"):
            # reference-format torch weights: weights-only warm start
            from ddti_tpu.train.torch_interop import import_state_dict, load_pth
            sd = load_pth(cfg.checkpoint_path)
            params, stats = import_state_dict(
                cfg.model_type, sd, trainer.state.params,
                trainer.state.batch_stats)
            trainer.state = trainer.state.replace(params=params,
                                                  batch_stats=stats)
            logger.info(f"Imported torch weights from {cfg.checkpoint_path}")
        elif cfg.checkpoint_path.endswith(".npz"):
            # .npz weight bundle (cli/average output, weight exports):
            # weights/stats-only warm start, like .pth
            if args.resume:
                raise ValueError(
                    ".npz bundles hold weights only (no optimizer/step); "
                    "use --checkpoint_path without --resume to warm start")
            from ddti_tpu.train.checkpoint import load_params_npz
            params, stats = load_params_npz(
                cfg.checkpoint_path, trainer.state.params,
                trainer.state.batch_stats)
            trainer.state = trainer.state.replace(params=params,
                                                  batch_stats=stats)
            logger.info(f"Warm-started weights from {cfg.checkpoint_path}")
        elif args.resume:
            # full resume: params + BN stats + optimizer + step. A managed
            # (rotated) checkpoint root — directory of numeric step dirs —
            # resumes from its newest step.
            cp = cfg.checkpoint_path
            if os.path.isdir(cp) and any(
                    d.isdigit() for d in os.listdir(cp)):
                from ddti_tpu.train.checkpoint import ManagedCheckpointer
                mgr = ManagedCheckpointer(cp)
                restored = mgr.restore_latest(trainer.state)
                mgr.close()
                if restored is None:
                    raise FileNotFoundError(
                        f"no checkpoint steps found under {cp}")
                trainer.state, step = restored
                logger.info(f"Resumed full state from {cp} step {step}")
            else:
                try:
                    trainer.state = restore_checkpoint(cp, trainer.state)
                except ValueError as e:
                    raise ValueError(
                        f"--resume could not restore {cp} into this run's "
                        "state — a full resume needs the SAME optimizer "
                        "structure (check --freeze/--clip_grad_norm match "
                        "the original run; use --checkpoint_path without "
                        "--resume for a weights-only warm start)") from e
                logger.info(f"Resumed full state from {cp}")
            # continue the ORIGINAL epoch budget: a run resumed at step S
            # trains epochs S//steps_per_epoch..--epochs, not --epochs
            # more (optimizer/SGDR state already continues from S)
            trainer.start_epoch = min(
                int(trainer.state.step) // trainer.steps_per_epoch,
                cfg.epochs)
        else:
            # reference-style warm start: weights/stats only. Restored
            # WITHOUT the current state as template — the saved opt_state
            # structure may legitimately differ from this run's (e.g.
            # warm-starting a --freeze fine-tune from a plain-AdamW
            # checkpoint) and weights-only loading never looks at it.
            from ddti_tpu.train.checkpoint import load_checkpoint_into
            params, stats = load_checkpoint_into(
                cfg.checkpoint_path, cfg.model_type, trainer.state.params,
                trainer.state.batch_stats, prefer_ema=False)
            trainer.state = trainer.state.replace(
                params=params, batch_stats=stats)
            logger.info(f"Warm-started weights from {cfg.checkpoint_path}")

    n_params = count_params(trainer.state.params)
    logger.info(f"Model: {cfg.model_type} | Trainable params: "
                f"{n_params / 1e6:.2f}M ({n_params:,})")
    print(f"[PARAMS] {cfg.model_type},{n_params}")  # shell-capture hook

    if args.lr_find:
        # LR range test instead of training: the real train step on real
        # batches, lr ramped geometrically; suggestions + curve artifacts
        # land in result/ (train/lr_finder.py). Rerun with --lr <pick>.
        from ddti_tpu.train.lr_finder import run_lr_finder
        r = run_lr_finder(trainer, num_steps=args.lr_find,
                          min_lr=args.lr_find_min, max_lr=args.lr_find_max)
        print(f"[LR_FIND] steepest={r['lr_steepest']:.4g} "
              f"min_over_10={r['lr_min_over_10']:.4g}")
        return 0

    if args.mode in ("train", "both"):
        trainer.train()
        if trainer.preempted:
            # graceful SIGTERM/SIGINT shutdown: checkpoints are saved by
            # train(); skip the test phase and exit with EX_TEMPFAIL so
            # schedulers/sweep runners can distinguish preemption from
            # failure and relaunch with --resume.
            hint = os.environ.get("DDTI_RESUME_HINT")
            if hint:
                # contract with cli/sweep.py: the runner reads this file
                # on exit-75 and relaunches the job with
                # --resume --checkpoint_path <checkpoint_path>
                try:
                    with open(hint, "w") as f:
                        json.dump({"checkpoint_path": os.path.join(
                            cfg.model_dir, f"{cfg.model_type}_last"),
                            "epochs": cfg.epochs}, f)
                except OSError as e:
                    logger.warning(f"could not write resume hint {hint}: {e}")
            logger.info("Run preempted — test phase skipped "
                        "(exit code 75, checkpoints saved)")
            return 75
    if args.mode in ("test", "both"):
        trainer.test()
    return 0


if __name__ == "__main__":
    sys.exit(main())

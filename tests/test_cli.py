"""CLI layer tests: main entry (synthetic end-to-end), config YAML dispatch,
config splitter, sweep runner."""

import os
import subprocess
import sys

import pytest
import yaml

from ddti_tpu.cli.main import build_config, get_parser
from ddti_tpu.cli.split_config import split_config
from ddti_tpu.cli.sweep import run_jobs


def test_parser_defaults_match_reference():
    args = get_parser().parse_args([])
    assert args.model_type == "ResUNet"
    assert args.bce_ratio == 1 and args.focal_ratio == 1
    assert args.dice_ratio == 0 and args.boundary_ratio == 0
    assert args.batch_size == 16 and args.lr == 1e-5
    assert args.epochs == 10000 and args.early_stop_patience == 50
    assert args.mixup_alpha == 0.2 and args.mixup_prob == 0.3


def test_warp_flags_round5_default():
    """Fast warp is default-on since round 5 (QUIRKS #23 equivalence);
    --aug_exact_warp restores the PIL bit-parity map, and the old
    --aug_fast_warp flag stays accepted as a no-op."""
    p = get_parser()
    assert p.parse_args([]).aug_fast_warp is True
    assert p.parse_args(["--aug_exact_warp"]).aug_fast_warp is False
    assert p.parse_args(["--aug_fast_warp"]).aug_fast_warp is True
    cfg = build_config(p.parse_args(["--aug_exact_warp"]))
    assert cfg.aug_fast_warp is False


def test_config_yaml_dispatch(tmp_path):
    doc = {"model": {"model_type": "VNet2D",
                     "kwargs": {"in_channels": 1, "out_channels": 1,
                                "base_filters": 24, "depth": 4}}}
    p = tmp_path / "c.yaml"
    p.write_text(yaml.safe_dump(doc))
    args = get_parser().parse_args(["--config_path", str(p)])
    cfg = build_config(args)
    assert cfg.model_type == "VNet2D"
    assert cfg.model_kwargs["base_filters"] == 24


def test_split_config(tmp_path):
    docs = [{"model": {"model_type": m, "kwargs": {"base_filters": bf}}}
            for m in ("UNet", "VNet2D") for bf in (8, 16, 32)]
    src = tmp_path / "matrix.yaml"
    src.write_text(yaml.safe_dump(docs))
    written = split_config(str(src), str(tmp_path))
    assert written == {"UNet": 3, "VNet2D": 3}
    assert (tmp_path / "UNet" / "config2.yaml").is_file()
    loaded = yaml.safe_load((tmp_path / "VNet2D" / "config3.yaml").read_text())
    assert loaded["model"]["kwargs"]["base_filters"] == 32


@pytest.mark.slow
def test_sweep_runner_concurrency(tmp_path):
    marker = tmp_path / "out"
    cmds = [[sys.executable, "-c",
             f"open(r'{marker}_{i}', 'w').write('done')"]
            for i in range(5)]
    codes = run_jobs(cmds, max_jobs=2, min_gap=0.0)
    assert codes == [0] * 5
    assert all((tmp_path / f"out_{i}").exists() for i in range(5))


@pytest.mark.slow
def test_sweep_runner_propagates_failure():
    codes = run_jobs([[sys.executable, "-c", "raise SystemExit(3)"]],
                     max_jobs=1, min_gap=0.0)
    assert codes == [3]


def test_main_synthetic_end_to_end(tmp_path):
    """Full CLI run in-process: 1 epoch train+test on synthetic data."""
    from ddti_tpu.cli.main import main

    rc = main(["--mode", "both", "--synthetic", "--epochs", "1",
               "--image_size", "32", "--store_size", "32",
               "--model_type", "UNet", "--base_filters", "8",
               "--depth", "3", "--batch_size", "8", "--lr", "1e-3",
               "--base_dir", str(tmp_path)])
    assert rc == 0
    runs = os.listdir(tmp_path)
    assert len(runs) == 1 and runs[0].startswith("UNet_")
    run = tmp_path / runs[0]
    assert (run / "config.yaml").is_file()
    assert (run / "models" / "UNet_best.npz").is_file()
    assert (run / "log" / "train_log.log").is_file()


@pytest.mark.slow
def test_main_host_augment_end_to_end(tmp_path):
    """Strict host-oracle augmentation path: PIL/cv2 chain feeding the
    device train step."""
    from ddti_tpu.cli.main import main

    rc = main(["--mode", "both", "--synthetic", "--host_augment",
               "--epochs", "1", "--image_size", "32", "--store_size", "32",
               "--model_type", "UNet", "--base_filters", "8",
               "--depth", "3", "--batch_size", "8", "--lr", "1e-3",
               "--base_dir", str(tmp_path)])
    assert rc == 0


@pytest.mark.slow
def test_sweep_retries(tmp_path):
    """A job that fails on the first attempt and succeeds on retry."""
    marker = tmp_path / "marker"
    script = (
        "import os, sys; p = r'%s';\n"
        "sys.exit(0) if os.path.exists(p) else "
        "(open(p, 'w').close(), sys.exit(1))" % marker)
    codes = run_jobs([[sys.executable, "-c", script]], max_jobs=1,
                     min_gap=0.0, retries=1)
    assert codes == [0]


def test_infer_cli_end_to_end(tmp_path):
    """Inference CLI over a directory: train-free (random weights) but
    exercises checkpoint load, batch predict, and png output."""
    import jax
    import jax.numpy as jnp

    from ddti_tpu.cli.infer import main as infer_main
    from ddti_tpu.data.synthetic import write_synthetic_dataset
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz

    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=3, n_val=1, n_test=1,
                            size=(32, 32))
    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    ck = str(tmp_path / "w.npz")
    save_params_npz(ck, v["params"], v["batch_stats"])

    out = str(tmp_path / "preds")
    rc = infer_main(["--checkpoint", ck, "--input_dir",
                     os.path.join(root, "train"), "--output_dir", out,
                     "--model_type", "UNet", "--base_filters", "8",
                     "--depth", "3", "--image_size", "32",
                     "--batch_size", "2"])
    assert rc == 0
    assert len(os.listdir(out)) == 3

    # sliding-window path
    out2 = str(tmp_path / "preds_sw")
    rc = infer_main(["--checkpoint", ck, "--input_dir",
                     os.path.join(root, "train"), "--output_dir", out2,
                     "--model_type", "UNet", "--base_filters", "8",
                     "--depth", "3", "--sliding_window", "--window", "32",
                     "--stride", "16"])
    assert rc == 0
    assert len(os.listdir(out2)) == 3

    # --threshold moves the operating point (live checkpoints): extreme
    # thresholds produce all-foreground / all-background masks
    import numpy as np
    from PIL import Image
    masks = {}
    for t in ("0.001", "0.999"):
        outt = str(tmp_path / f"preds_t{t}")
        rc = infer_main(["--checkpoint", ck, "--input_dir",
                         os.path.join(root, "train"), "--output_dir", outt,
                         "--model_type", "UNet", "--base_filters", "8",
                         "--depth", "3", "--image_size", "32",
                         "--batch_size", "2", "--threshold", t])
        assert rc == 0
        name = sorted(os.listdir(outt))[0]
        masks[t] = np.asarray(Image.open(os.path.join(outt, name)))
    assert masks["0.001"].min() == 255 and masks["0.999"].max() == 0


@pytest.mark.slow
def test_infer_cli_ensemble(tmp_path):
    """--checkpoint a,b: probability-mean ensemble over live checkpoints
    (cli/infer.py). Self-ensemble must reproduce the single-model masks
    bit-exactly; a two-member ensemble with --prob writes the mean map;
    .stablehlo members are rejected with a clear error."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ddti_tpu.cli.infer import main as infer_main
    from ddti_tpu.data.synthetic import write_synthetic_dataset
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz

    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=3, n_val=1, n_test=1,
                            size=(32, 32))
    model = create_model("UNet", base_filters=8, depth=3)
    cks = []
    for seed in (0, 1):
        v = model.init({"params": jax.random.PRNGKey(seed)},
                       jnp.zeros((1, 32, 32, 1)), train=False)
        ck = str(tmp_path / f"w{seed}.npz")
        save_params_npz(ck, v["params"], v["batch_stats"])
        cks.append(ck)

    base = ["--input_dir", os.path.join(root, "train"), "--model_type",
            "UNet", "--base_filters", "8", "--depth", "3", "--image_size",
            "32", "--batch_size", "2", "--prob"]

    def probs(outdir, checkpoint):
        rc = infer_main(["--checkpoint", checkpoint, "--output_dir",
                         outdir] + base)
        assert rc == 0
        return {n: np.asarray(Image.open(os.path.join(outdir, n)),
                              np.float32)
                for n in sorted(os.listdir(outdir))
                if n.endswith("_pred.png")}

    single = probs(str(tmp_path / "o1"), cks[0])
    both = probs(str(tmp_path / "o2"), ",".join(cks))
    selfens = probs(str(tmp_path / "o3"), ",".join([cks[0], cks[0]]))
    other = probs(str(tmp_path / "o4"), cks[1])
    assert single.keys() == both.keys() == selfens.keys()
    for n in single:
        # self-ensemble == the member (mean of identical probs; the
        # logit(mean) round trip costs < 1 gray level)
        assert np.abs(selfens[n] - single[n]).max() <= 1.0
        # two-member mean sits between the members (within png rounding)
        lo = np.minimum(single[n], other[n]) - 1.0
        hi = np.maximum(single[n], other[n]) + 1.0
        assert (both[n] >= lo).all() and (both[n] <= hi).all()
        assert not np.array_equal(both[n], single[n])

    # .stablehlo members are rejected
    rc = infer_main(["--checkpoint", cks[0] + ",x.stablehlo",
                     "--output_dir", str(tmp_path / "o5")] + base)
    assert rc == 1


def test_export_cli_ensemble_bundle(tmp_path):
    """ddti-export: a comma-list of checkpoints becomes ONE deployable
    ensemble bundle (vmapped members + probability-mean vote baked in);
    the artifact serves through the standard bundle loader and the infer
    CLI, and its masks match the live ensemble computation."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddti_tpu.cli.export import main as export_main
    from ddti_tpu.cli.infer import main as infer_main
    from ddti_tpu.data.synthetic import write_synthetic_dataset
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz
    from ddti_tpu.train.export import load_serving_bundle

    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=3, n_val=1, n_test=1,
                            size=(32, 32))
    model = create_model("UNet", base_filters=8, depth=3)
    cks, vs = [], []
    for seed in (0, 1):
        v = model.init({"params": jax.random.PRNGKey(seed)},
                       jnp.zeros((1, 32, 32, 1)), train=False)
        ck = str(tmp_path / f"w{seed}.npz")
        save_params_npz(ck, v["params"], v["batch_stats"])
        cks.append(ck)
        vs.append(v)

    out = str(tmp_path / "ens")
    rc = export_main(["--checkpoint", ",".join(cks), "--output", out,
                      "--model_type", "UNet", "--base_filters", "8",
                      "--depth", "3", "--image_size", "32",
                      "--batch_size", "2", "--input_dtype", "uint8",
                      "--threshold", "0.4"])
    assert rc == 0
    prog = out + "_serving_program.stablehlo"
    assert os.path.exists(prog) and os.path.exists(out
                                                   + "_serving_program.npz")

    serve, batch_n, size, in_dtype = load_serving_bundle(prog)
    assert (batch_n, size, in_dtype) == (2, 32, jnp.uint8)
    x_u8 = np.random.default_rng(0).integers(
        0, 255, (2, 32, 32, 1), dtype=np.uint8)
    got = np.asarray(serve(x_u8))

    # live ensemble oracle: mean of member sigmoids, thresholded at 0.4
    x = jnp.asarray(x_u8, jnp.float32) / 255.0
    probs = np.mean([np.asarray(jax.nn.sigmoid(
        model.apply(v, x, train=False))) for v in vs], axis=0)
    want = (probs > 0.4).astype(np.uint8)
    assert np.array_equal(got, want)

    # the bundle drives the infer CLI like any other artifact
    outdir = str(tmp_path / "preds")
    rc = infer_main(["--checkpoint", prog, "--input_dir",
                     os.path.join(root, "train"), "--output_dir", outdir])
    assert rc == 0
    assert len([n for n in os.listdir(outdir)
                if n.endswith("_pred.png")]) == 3


def test_infer_cli_serving_bundle(tmp_path):
    """Serving-bundle path: --checkpoint <program>.stablehlo + paired .npz
    drives inference with no model code (ROADMAP #7). Covers the padded
    partial batch (3 images through a batch-2 program) and the baked-weights
    single-file artifact."""
    import jax
    import jax.numpy as jnp

    from ddti_tpu.cli.infer import main as infer_main
    from ddti_tpu.data.synthetic import write_synthetic_dataset
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz
    from ddti_tpu.train.export import (
        export_serving,
        export_serving_program,
    )

    root = str(tmp_path / "ds")
    write_synthetic_dataset(root, n_train=3, n_val=1, n_test=1,
                            size=(32, 32))
    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)

    blob, variables = export_serving_program(
        model, v["params"], v["batch_stats"], batch=2, size=32)
    prog = str(tmp_path / "m_serving_program.stablehlo")
    with open(prog, "wb") as f:
        f.write(blob)
    save_params_npz(str(tmp_path / "m_serving_program.npz"),
                    variables["params"], variables["batch_stats"])

    out = str(tmp_path / "preds")
    rc = infer_main(["--checkpoint", prog, "--input_dir",
                     os.path.join(root, "train"), "--output_dir", out])
    assert rc == 0
    assert len(os.listdir(out)) == 3

    # baked-weights artifact: one file, no .npz needed
    baked = str(tmp_path / "baked.stablehlo")
    with open(baked, "wb") as f:
        f.write(export_serving(model, v["params"], v["batch_stats"],
                               batch=2, size=32, input_dtype=jnp.uint8))
    out2 = str(tmp_path / "preds_baked")
    rc = infer_main(["--checkpoint", baked, "--input_dir",
                     os.path.join(root, "train"), "--output_dir", out2])
    assert rc == 0
    assert len(os.listdir(out2)) == 3

    # sliding_window works on fixed-shape artifacts too (tiled serving,
    # covered in depth by test_infer_cli_bundle_sliding_window)
    out3 = str(tmp_path / "preds_tiled")
    rc = infer_main(["--checkpoint", prog, "--input_dir",
                     os.path.join(root, "train"), "--output_dir", out3,
                     "--sliding_window"])
    assert rc == 0
    assert len(os.listdir(out3)) == 3


def test_infer_cli_bundle_sliding_window(tmp_path):
    """--sliding_window on a serving bundle: native-resolution frames are
    tiled into the artifact's fixed (window, window) input and the
    binarized tiles blend by Hann-weighted vote (cli/infer.py
    _serve_bundle_tiled). Uses an int8-quantized bundle so the whole
    deployment stack (quantize -> export -> tiled serve) is one path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ddti_tpu.cli.infer import main as infer_main
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_variables_npz
    from ddti_tpu.train.quantize import export_serving_int8

    model = create_model("UNet", base_filters=8, depth=3)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    blob, variables = export_serving_int8(
        model, v["params"], v["batch_stats"], batch=2, size=32,
        calib_images=x, input_dtype=jnp.uint8)
    prog = str(tmp_path / "m_serving_program.stablehlo")
    with open(prog, "wb") as f:
        f.write(blob)
    save_variables_npz(str(tmp_path / "m_serving_program.npz"), variables)

    # a frame LARGER than the window and not a stride multiple (49x71)
    ind = tmp_path / "imgs"
    ind.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (49, 71), dtype=np.uint8),
                    "L").save(str(ind / "frame.png"))
    out = str(tmp_path / "preds")
    rc = infer_main(["--checkpoint", prog, "--input_dir", str(ind),
                     "--output_dir", out, "--sliding_window",
                     "--stride", "16"])
    assert rc == 0
    pred = np.asarray(Image.open(os.path.join(out, "frame_pred.png")))
    assert pred.shape == (49, 71)
    assert set(np.unique(pred)) <= {0, 255}


def test_quantize_cli_end_to_end(tmp_path):
    """cli/quantize: existing .npz checkpoint -> int8 serving bundle ->
    infer CLI serves from it. The offline deployment path (no training
    pipeline involved)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ddti_tpu.cli.infer import main as infer_main
    from ddti_tpu.cli.quantize import main as quantize_main
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz

    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    ck = str(tmp_path / "w.npz")
    save_params_npz(ck, v["params"], v["batch_stats"])

    calib = tmp_path / "calib"
    calib.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (40, 40), dtype=np.uint8),
                        "L").save(str(calib / f"c{i}.png"))

    out_prefix = str(tmp_path / "q" / "UNet")
    rc = quantize_main(["--checkpoint", ck, "--output", out_prefix,
                        "--model_type", "UNet", "--base_filters", "8",
                        "--depth", "3", "--image_size", "32",
                        "--batch_size", "2", "--calib_dir", str(calib)])
    assert rc == 0
    prog = out_prefix + "_serving_program.stablehlo"
    assert os.path.isfile(prog) and os.path.isfile(
        out_prefix + "_serving_program.npz")

    preds = str(tmp_path / "preds")
    rc = infer_main(["--checkpoint", prog, "--input_dir", str(calib),
                     "--output_dir", preds])
    assert rc == 0
    assert len(os.listdir(preds)) == 4


def test_config_snapshot_contents(tmp_path):
    from ddti_tpu.core import Config

    cfg = Config(model_type="VNet2D", base_dir=str(tmp_path), lr=5e-4)
    cfg.make_dirs()
    snap = yaml.safe_load(open(os.path.join(cfg.cfg_dir, "config.yaml")))
    assert snap["model_type"] == "VNet2D"
    assert snap["lr"] == 5e-4
    assert snap["model_dir"].endswith("models")


def test_apply_model_yaml_missing_raises(tmp_path):
    from ddti_tpu.core import Config

    cfg = Config()
    with pytest.raises(FileNotFoundError):
        cfg.apply_model_yaml(str(tmp_path / "nope.yaml"))


def test_config_from_dict_filters_unknown():
    from ddti_tpu.core import Config

    cfg = Config.from_dict({"lr": 0.1, "bogus": 1, "model_type": "UNet"})
    assert cfg.lr == 0.1 and cfg.model_type == "UNet"


@pytest.mark.slow
def test_sweep_config_dir_end_to_end(tmp_path):
    """run.sh semantics end-to-end: split a 2-entry matrix, sweep it with
    subprocess jobs (CPU-forced), verify both runs trained."""
    docs = [{"model": {"model_type": m,
                       "kwargs": {"in_channels": 1, "out_channels": 1,
                                  "base_filters": 8, "depth": 3}}}
            for m in ("UNet", "VNet2D")]
    matrix = tmp_path / "matrix.yaml"
    matrix.write_text(yaml.safe_dump(docs))
    sweep_dir = tmp_path / "sweep"
    split_config(str(matrix), str(sweep_dir))

    from ddti_tpu.cli.sweep import main as sweep_main

    exp = tmp_path / "exp"
    rc = sweep_main([
        "--config_dir", str(sweep_dir), "--max_jobs", "2",
        "--min_gap", "0",
        "--extra", ("--cpu --mode both --synthetic --epochs 1 "
                    "--image_size 32 --store_size 32 --batch_size 8 "
                    f"--base_dir {exp}")])
    assert rc == 0
    runs = sorted(os.listdir(exp))
    assert any(r.startswith("UNet_") for r in runs)
    assert any(r.startswith("VNet2D_") for r in runs)


@pytest.mark.slow
def test_main_native_loader_end_to_end(tmp_path):
    """--native_loader on: the train split streams through the C++ mmap
    loader (Trainer's host-streaming path), val/test stay device-resident."""
    import pytest

    from ddti_tpu.data.synthetic import write_synthetic_dataset
    from ddti_tpu.runtime import native_available

    if not native_available():
        pytest.skip("native runtime unavailable (no g++/make)")
    from ddti_tpu.cli.main import main

    root = tmp_path / "ds"
    write_synthetic_dataset(str(root), n_train=16, n_val=4, n_test=4,
                            size=(32, 32), seed=0)
    rc = main(["--mode", "both", "--epochs", "1", "--image_size", "32",
               "--store_size", "32", "--model_type", "UNet",
               "--base_filters", "8", "--depth", "3", "--batch_size", "8",
               "--lr", "1e-3", "--native_loader", "on",
               "--dataset_path", str(root),
               "--base_dir", str(tmp_path / "exp")])
    assert rc == 0
    run = (tmp_path / "exp") / os.listdir(tmp_path / "exp")[0]
    log = (run / "log" / "train_log.log").read_text()
    assert "Train Epoch: 1" in log
    assert (root / ".store_cache").is_dir()  # raw .u8 store materialized


def test_params_tool_prints_reference_set(capsys):
    """The test.py equivalent counts the SAME models the reference tool
    counts (legacy zoo, torch-default ctors at 512px) plus the active
    zoo; LegacyUNet's golden comes from running the torch reference."""
    from ddti_tpu.cli.params import main as params_main

    assert params_main([]) == 0
    out = capsys.readouterr().out
    assert "UNet: 31042369" in out  # legacy UNet golden (torch reference)
    assert "# active zoo" in out
    assert out.count("TransUNet:") == 2  # both sections


def test_use_data_parallel_false_parses_false():
    """QUIRKS #19: the reference's type=bool makes '--use_data_parallel
    False' truthy; our parser treats booleans as booleans."""
    from ddti_tpu.cli.main import get_parser

    p = get_parser()
    assert p.parse_args(["--use_data_parallel", "False"]
                        ).use_data_parallel is False
    assert p.parse_args(["--use_data_parallel", "true"]
                        ).use_data_parallel is True
    assert p.parse_args([]).use_data_parallel is True


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """The CLIs' persistent-cache switch: explicit dir is created and set,
    'off'/'' disable, 'auto' resolves through DDTI_COMPILATION_CACHE.
    Restores the suite's own cache config afterwards."""
    import jax

    from ddti_tpu.core import enable_compilation_cache

    before = jax.config.jax_compilation_cache_dir
    before_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        d = tmp_path / "cc"
        assert enable_compilation_cache(str(d)) == str(d)
        assert d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)

        assert enable_compilation_cache("off") is None
        assert enable_compilation_cache("") is None
        # ... and disabling does not clobber the configured dir
        assert jax.config.jax_compilation_cache_dir == str(d)

        auto_d = tmp_path / "auto_cc"
        monkeypatch.setenv("DDTI_COMPILATION_CACHE", str(auto_d))
        assert enable_compilation_cache("auto") == str(auto_d)
        assert auto_d.is_dir()
        monkeypatch.setenv("DDTI_COMPILATION_CACHE", "off")
        assert enable_compilation_cache("auto") is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          before_min)


@pytest.mark.slow
def test_resume_continues_epoch_budget(tmp_path):
    """--resume completes the ORIGINAL --epochs budget: a run stopped
    after 2/3 epochs trains exactly one more epoch, not three more (the
    restored optimizer step also continues the SGDR schedule —
    tests/test_train.py covers that half)."""
    from ddti_tpu.cli.main import main

    base = ["--synthetic", "--mode", "train", "--image_size", "32",
            "--store_size", "32", "--model_type", "UNet",
            "--base_filters", "8", "--depth", "2", "--batch_size", "8",
            "--lr", "1e-3", "--save_interval", "1",
            "--early_stop_patience", "50"]
    assert main(base + ["--epochs", "2",
                        "--base_dir", str(tmp_path / "r1")]) == 0
    run1 = tmp_path / "r1" / os.listdir(tmp_path / "r1")[0]
    periodic = run1 / "models" / "periodic"
    assert periodic.is_dir()

    assert main(base + ["--epochs", "3", "--resume",
                        "--checkpoint_path", str(periodic),
                        "--base_dir", str(tmp_path / "r2")]) == 0
    run2 = tmp_path / "r2" / os.listdir(tmp_path / "r2")[0]
    log = (run2 / "log" / "train_log.log").read_text()
    assert "Resuming at epoch 3/3" in log
    assert "Train Epoch: 3," in log
    assert "Train Epoch: 1," not in log  # epochs 1-2 were NOT re-run


def test_bundle_set_shares_weights(tmp_path):
    """A multi-batch bundle set of the same model holds ONE copy of the
    weights on device (load_serving_bundle shared_variables)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz
    from ddti_tpu.train.export import (
        export_serving_program,
        load_serving_bundle,
    )

    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    progs = []
    for batch in (2, 4):
        blob, svars = export_serving_program(
            model, v["params"], v["batch_stats"], batch=batch, size=32,
            input_dtype=jnp.uint8)
        p = str(tmp_path / f"b{batch}_serving_program.stablehlo")
        with open(p, "wb") as f:
            f.write(blob)
        save_params_npz(str(tmp_path / f"b{batch}_serving_program.npz"),
                        svars["params"], svars["batch_stats"])
        progs.append(p)

    fn1, *_ = load_serving_bundle(progs[0])
    fn2, *_ = load_serving_bundle(progs[1], shared_variables=fn1.variables)
    assert fn2.variables is fn1.variables
    x = np.zeros((4, 32, 32, 1), np.uint8)
    a = np.asarray(fn2(x))
    b = np.asarray(fn1(x[:2]))
    np.testing.assert_array_equal(a[:2], b)

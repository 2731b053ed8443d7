"""Multi-device (8 fake CPU devices) data-parallel tests — the fake-cluster
substitute for a real TPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ddti_tpu.core import Config
from ddti_tpu.data import generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.parallel import batch_sharding, make_mesh, replicated
from ddti_tpu.train import create_train_state, make_eval_step, make_train_step
from ddti_tpu.train.engine import aug_config_from


@pytest.fixture(scope="module")
def mesh8(eight_devices):
    return make_mesh({"data": 8}, eight_devices)


def _setup(cfg, seed=0):
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(seed),
                               (1, 32, 32, 1), cfg.lr, steps_per_epoch=10)
    im, ma = generate_ddti_like(16, (32, 32), 0)
    return state, jnp.asarray(im), jnp.asarray(ma)


def test_mesh_construction(eight_devices):
    mesh = make_mesh({"data": 4, "model": 2}, eight_devices)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_mesh_wrong_count_raises(eight_devices):
    with pytest.raises(ValueError):
        make_mesh({"data": 5}, eight_devices)


def test_dp_step_matches_single_device(mesh8):
    """The data-parallel step must be numerically equivalent to the
    single-device step (same global batch, same key). SGD optimizer so the
    param delta IS the gradient (AdamW's first-step normalization would
    amplify reduction-order noise in near-zero gradients to +-lr)."""
    import optax

    from ddti_tpu.train.state import TrainState

    cfg = Config(batch_size=16, image_size=32, store_size=32, lr=1e-3)
    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    tx = optax.sgd(1e-2)
    state1 = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                        batch_stats=v["batch_stats"],
                        opt_state=tx.init(v["params"]), tx=tx,
                        apply_fn=model.apply)
    im, ma = generate_ddti_like(16, (32, 32), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    # independent copy (the step donates its input state; device_put may
    # alias buffers, so round-trip through the host)
    state2 = jax.device_put(jax.device_get(state1), replicated(mesh8))
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(3)

    new1, m1 = step(state1, im, ma, key)
    sh = batch_sharding(mesh8)
    im_s = jax.device_put(im, sh)
    ma_s = jax.device_put(ma, sh)
    with mesh8:
        new2, m2 = step(state2, im_s, ma_s, key)

    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=2e-5)
    assert float(m1.counts.tp) == float(m2.counts.tp)
    for a, b in zip(jax.tree.leaves(new1.params),
                    jax.tree.leaves(new2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_dp_fast_warp_step_matches_single_device(mesh8):
    """--aug_fast_warp's barrel rolls/selects must shard cleanly over the
    batch axis: the DP step equals the single-device step bit-for-bit in
    loss/counts (same key => same per-image shifts either way)."""
    cfg = Config(batch_size=16, image_size=32, store_size=32, lr=1e-3,
                 aug_fast_warp=True)
    state, im, ma = _setup(cfg)
    state2 = jax.device_put(jax.device_get(state), replicated(mesh8))
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(5)
    new1, m1 = step(state, im, ma, key)
    with mesh8:
        new2, m2 = step(state2, jax.device_put(im, batch_sharding(mesh8)),
                        jax.device_put(ma, batch_sharding(mesh8)), key)
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=2e-5)
    assert float(m1.counts.tp) == float(m2.counts.tp)
    assert float(m1.counts.fp) == float(m2.counts.fp)


@pytest.mark.slow
def test_dp_selective_remat_step_matches_single_device(mesh8):
    """Selective per-level remat (r5, --remat 0,1) composed with a
    DP-sharded mesh: jax.checkpoint must not perturb the GSPMD-partitioned
    step — loss/counts equal the single-device run."""
    from ddti_tpu.models import create_model
    from ddti_tpu.train import create_train_state

    cfg = Config(batch_size=16, image_size=32, store_size=32, lr=1e-3)
    model = create_model("ResUNet", base_filters=8, depth=3, remat=(0, 1))
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    im, ma = generate_ddti_like(16, (32, 32), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    state2 = jax.device_put(jax.device_get(state), replicated(mesh8))
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(5)
    new1, m1 = step(state, im, ma, key)
    with mesh8:
        new2, m2 = step(state2, jax.device_put(im, batch_sharding(mesh8)),
                        jax.device_put(ma, batch_sharding(mesh8)), key)
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=2e-5)
    assert float(m1.counts.tp) == float(m2.counts.tp)


@pytest.mark.slow
def test_spatial_fast_warp_step_matches_single_device(eight_devices):
    """--aug_fast_warp under a spatial (H-sharded) mesh: the barrel rolls
    cross shard boundaries, so GSPMD must insert the halo exchanges; the
    result must still equal the single-device step."""
    mesh = make_mesh({"data": 4, "model": 2}, eight_devices)
    cfg = Config(batch_size=8, image_size=32, store_size=32, lr=1e-3,
                 aug_fast_warp=True)
    state, im, ma = _setup(cfg)
    im, ma = im[:8], ma[:8]
    state2 = jax.device_put(jax.device_get(state), replicated(mesh))
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(9)
    new1, m1 = step(state, im, ma, key)
    sh = batch_sharding(mesh, spatial=True)
    with mesh:
        new2, m2 = step(state2, jax.device_put(im, sh),
                        jax.device_put(ma, sh), key)
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=2e-5)
    assert float(m1.counts.tp) == float(m2.counts.tp)


def test_dp_eval_step_counts_match(mesh8):
    cfg = Config(batch_size=16, image_size=32, store_size=32, lr=1e-3)
    state, im, ma = _setup(cfg)
    estep = make_eval_step(cfg)
    m1 = estep(state, im, ma)
    with mesh8:
        m2 = estep(jax.device_put(state, replicated(mesh8)),
                   jax.device_put(im, batch_sharding(mesh8)),
                   jax.device_put(ma, batch_sharding(mesh8)))
    assert float(m1.counts.tp) == float(m2.counts.tp)
    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=2e-5)


@pytest.mark.slow
def test_spatial_partition_step_runs(eight_devices):
    """DP x spatial(H) sharding: GSPMD must insert conv halo exchanges."""
    mesh = make_mesh({"data": 4, "model": 2}, eight_devices)
    cfg = Config(batch_size=8, image_size=32, store_size=32, lr=1e-3)
    model = create_model("UNet", base_filters=8, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 1),
                               cfg.lr, steps_per_epoch=10)
    im, ma = generate_ddti_like(8, (32, 32), 0)
    sh = NamedSharding(mesh, P("data", "model", None, None))
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(cfg, aug_config_from(cfg))
    with mesh:
        new_state, m = step(state, jax.device_put(jnp.asarray(im), sh),
                            jax.device_put(jnp.asarray(ma), sh),
                            jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))


@pytest.mark.slow  # ~4-5 min (two mesh shapes + the 2-process DCN leg);
# the driver runs this entrypoint independently every round
# (MULTICHIP_r0N.json)
def test_dryrun_multichip_entrypoint():
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(root, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.parametrize("serving_dtype", [
    # bf16 (the production default) stays in the fast tier; the other two
    # dtypes exercise the same engine path and run in the full tier
    pytest.param("f32", marks=pytest.mark.slow),
    "bf16",
    pytest.param("int8", marks=pytest.mark.slow)])
def test_trainer_end_to_end_on_mesh(tmp_path, eight_devices, serving_dtype):
    """Full Trainer (train + validate + test) over an 8-device DP mesh,
    for every --serving_dtype. The engine's export tail is wrapped in
    ``except Exception`` (export must never fail a run), so a regression
    in the sharded bf16/int8 branches only surfaces here: assert the
    sharded bundle exists AND actually serves on the mesh."""
    import os

    from ddti_tpu.core import create_logger
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.train import Trainer

    mesh = make_mesh({"data": 8}, eight_devices)
    cfg = Config(epochs=1, batch_size=8, image_size=32, store_size=32,
                 lr=1e-3, model_type="UNet", base_dir=str(tmp_path),
                 export_serving=True, serving_dtype=serving_dtype)
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((16, 0), (8, 1), (8, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model, mesh=mesh)
    tr.train()
    m = tr.test(visualize=False)
    assert 0.0 <= m["acc"] <= 1.0
    # mesh runs also export a scale-out sharded serving program + weights
    spath = os.path.join(cfg.model_dir, "UNet_serving_sharded.stablehlo")
    assert os.path.isfile(spath)
    assert os.path.isfile(spath[: -len(".stablehlo")] + ".npz")
    from jax import export as jax_export
    exported = jax_export.deserialize(open(spath, "rb").read())
    assert exported.nr_devices == 8
    # the bundle must load and serve end-to-end on the mesh
    from ddti_tpu.train.export import load_serving_bundle
    fn, batch, size, in_dtype = load_serving_bundle(spath)
    imgs = np.zeros((batch, size, size, 1), in_dtype)
    masks = np.asarray(fn(imgs))
    assert masks.shape == (batch, size, size, 1)
    assert masks.dtype == np.uint8
    if serving_dtype == "int8":
        npz = np.load(spath[: -len(".stablehlo")] + ".npz")
        assert any(k.startswith("quant/") for k in npz.files)


@pytest.mark.slow
def test_fused_epoch_on_mesh(tmp_path, eight_devices):
    """fused_epoch + mesh: batch axis sharded over "data" inside the
    scanned program; results match the single-device fused run."""
    import os

    from ddti_tpu.core import Config, create_logger
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.train import Trainer

    def run(mesh):
        cfg = Config(epochs=1, batch_size=8, image_size=32, store_size=32,
                     lr=1e-3, model_type="UNet", fused_epoch=True,
                     base_dir=str(tmp_path / f"m{mesh is not None}"))
        cfg.make_dirs()
        logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
        srcs = tuple(
            DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
            for n, s in ((16, 0), (8, 1), (8, 2)))
        model = create_model("UNet", base_filters=8, depth=3)
        tr = Trainer(cfg, srcs, logger, model, mesh=mesh)
        tr.train_one_epoch(0)
        _, iou = tr.validate(0)
        return jax.device_get(tr.state), iou

    s1, iou1 = run(None)
    mesh = make_mesh({"data": 8}, eight_devices)
    s2, iou2 = run(mesh)
    assert int(s1.step) == int(s2.step)
    assert iou1 == pytest.approx(iou2, abs=0.05)


def test_parse_mesh_spec():
    from ddti_tpu.parallel import parse_mesh_spec

    assert parse_mesh_spec("data=4,model=2") == {"data": 4, "model": 2}
    assert parse_mesh_spec("data=8") == {"data": 8}
    with pytest.raises(ValueError):
        parse_mesh_spec("data=four")
    with pytest.raises(ValueError):
        parse_mesh_spec("")


def test_trainer_spatial_mesh_sharding(tmp_path, eight_devices):
    """--mesh data=4,model=2 as a *product* path: the Trainer must shard
    batches (N over data, H over model) and train/validate end-to-end."""
    import os

    from ddti_tpu.core import create_logger
    from ddti_tpu.data import DeviceDataSource
    from ddti_tpu.train import Trainer

    mesh = make_mesh({"data": 4, "model": 2}, eight_devices)
    cfg = Config(epochs=1, batch_size=8, image_size=32, store_size=32,
                 lr=1e-3, model_type="UNet", base_dir=str(tmp_path))
    cfg.make_dirs()
    logger = create_logger(os.path.join(cfg.log_dir, "train_log.log"))
    srcs = tuple(
        DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
        for n, s in ((16, 0), (8, 1), (8, 2)))
    model = create_model("UNet", base_filters=8, depth=3)
    tr = Trainer(cfg, srcs, logger, model, mesh=mesh)
    assert tr._batch_sh.spec == P("data", "model", None, None)
    tr.train_one_epoch(0)
    _, iou = tr.validate(0)
    assert 0.0 <= iou <= 1.0


@pytest.mark.slow
def test_spatial_partition_512(eight_devices):
    """The benchmark-resolution spatial case: one DP x spatial train step at
    512x512 on the 8-device mesh (H sharded 2-way -> 256-row halo shards)."""
    mesh = make_mesh({"data": 4, "model": 2}, eight_devices)
    cfg = Config(batch_size=4, image_size=512, store_size=512, lr=1e-3)
    model = create_model("UNet", base_filters=4, depth=3)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, 512, 512, 1), cfg.lr, steps_per_epoch=10)
    im, ma = generate_ddti_like(4, (512, 512), 0)
    sh = batch_sharding(mesh, spatial=True)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(cfg, aug_config_from(cfg))
    with mesh:
        _, m = step(state, jax.device_put(jnp.asarray(im), sh),
                    jax.device_put(jnp.asarray(ma), sh),
                    jax.random.PRNGKey(1))
    assert np.isfinite(float(m.loss))


def test_cli_mesh_flag_end_to_end(tmp_path):
    """python main.py --mesh data=4,model=2: the dryrun capability as a
    user-invokable product feature."""
    import os

    from ddti_tpu.cli.main import main

    rc = main(["--mode", "train", "--synthetic", "--epochs", "1",
               "--image_size", "32", "--store_size", "32",
               "--model_type", "UNet", "--base_filters", "8",
               "--depth", "3", "--batch_size", "8", "--lr", "1e-3",
               "--mesh", "data=4,model=2", "--base_dir", str(tmp_path)])
    assert rc == 0
    run = tmp_path / os.listdir(tmp_path)[0]
    log = (run / "log" / "train_log.log").read_text()
    assert "explicit mesh {'data': 4, 'model': 2}" in log


def test_sharded_serving_export_roundtrip(mesh8):
    """export_serving_sharded: the serialized program carries GSPMD
    shardings (weights replicated, batch over 'data'); deserialized, it
    serves a globally-sharded batch on the 8-device mesh and matches the
    single-device serving masks exactly."""
    from ddti_tpu.train.export import (
        export_serving_sharded,
        load_serving,
        make_serve_fn,
    )

    model = create_model("UNet", base_filters=8, depth=3)
    x_host, _ = generate_ddti_like(16, (32, 32), 3)
    x_host = x_host.astype(np.float32) / 255.0
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.asarray(x_host[:1]), train=False)

    blob, variables = export_serving_sharded(
        model, v["params"], v["batch_stats"], mesh8, batch=16, size=32)
    fn = load_serving(blob)

    rep = NamedSharding(mesh8, P())
    dp = NamedSharding(mesh8, P("data"))
    var_dev = jax.device_put(variables, rep)
    x_dev = jax.device_put(jnp.asarray(x_host), dp)
    got = fn(var_dev, x_dev)
    assert got.sharding.is_equivalent_to(dp, ndim=got.ndim)

    want = make_serve_fn(model, v["params"], v["batch_stats"])(
        jnp.asarray(x_host))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_int8_sharded_serving_export(mesh8):
    """Int8 + GSPMD in one artifact (export_serving_int8_sharded): the
    quantized graph serves a batch sharded over the 8-device mesh and
    matches the single-device quantized masks exactly."""
    from ddti_tpu.train.export import load_serving
    from ddti_tpu.train.quantize import (
        export_serving_int8_sharded,
        quantize_serving,
        quantized_apply,
    )

    model = create_model("UNet", base_filters=8, depth=3)
    im, _ = generate_ddti_like(16, (32, 32), 5)
    x = jnp.asarray(im)
    calib = x.astype(jnp.float32) / 255.0
    v = model.init({"params": jax.random.PRNGKey(0)}, calib[:1],
                   train=False)

    blob, variables = export_serving_int8_sharded(
        model, v["params"], v["batch_stats"], mesh8, batch=16, size=32,
        calib_images=calib)
    fn = load_serving(blob)
    rep = NamedSharding(mesh8, P())
    dp = NamedSharding(mesh8, P("data"))
    got = fn(jax.device_put(variables, rep), jax.device_put(x, dp))
    assert got.sharding.is_equivalent_to(dp, ndim=got.ndim)

    qv = quantize_serving(model, v["params"], v["batch_stats"], calib)
    logits = quantized_apply(model, qv, calib, train=False)
    want = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5)
    np.testing.assert_array_equal(np.asarray(got).astype(bool),
                                  np.asarray(want))


def test_infer_cli_sharded_bundle(tmp_path, mesh8):
    """The infer CLI serves straight from a SHARDED artifact: the bundle
    loader builds a data-axis mesh from local devices, replicates weights,
    shards the batch (train/export.py load_serving_bundle)."""
    import os

    from PIL import Image

    from ddti_tpu.cli.infer import main as infer_main
    from ddti_tpu.train.checkpoint import save_variables_npz
    from ddti_tpu.train.export import export_serving_sharded

    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    blob, variables = export_serving_sharded(
        model, v["params"], v["batch_stats"], mesh8, batch=8, size=32)
    prog = str(tmp_path / "m_serving_program.stablehlo")
    with open(prog, "wb") as f:
        f.write(blob)
    save_variables_npz(str(tmp_path / "m_serving_program.npz"),
                       {"params": variables["params"],
                        "batch_stats": variables["batch_stats"]})

    ind = tmp_path / "imgs"
    ind.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):  # partial batch through an 8-wide sharded program
        Image.fromarray(rng.integers(0, 255, (32, 32), dtype=np.uint8),
                        "L").save(str(ind / f"f{i}.png"))
    out = str(tmp_path / "preds")
    rc = infer_main(["--checkpoint", prog, "--input_dir", str(ind),
                     "--output_dir", out])
    assert rc == 0
    assert len(os.listdir(out)) == 3


@pytest.mark.slow
def test_dp_grad_accum_step_matches_single_device(mesh8):
    """grad_accum=2 under a data-sharded mesh: the (K, B/K, ...) microbatch
    reshape must stay GSPMD-shardable and match the single-device result
    (same global batch, same key; SGD for delta-is-gradient exactness)."""
    import optax

    from ddti_tpu.train.state import TrainState

    cfg = Config(batch_size=16, image_size=32, store_size=32, lr=1e-3,
                 grad_accum=2)
    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    tx = optax.sgd(1e-2)
    state1 = TrainState(step=jnp.zeros((), jnp.int32), params=v["params"],
                        batch_stats=v["batch_stats"],
                        opt_state=tx.init(v["params"]), tx=tx,
                        apply_fn=model.apply)
    im, ma = generate_ddti_like(16, (32, 32), 0)
    im, ma = jnp.asarray(im), jnp.asarray(ma)
    state2 = jax.device_put(jax.device_get(state1), replicated(mesh8))
    step = make_train_step(cfg, aug_config_from(cfg))
    key = jax.random.PRNGKey(3)

    new1, m1 = step(state1, im, ma, key)
    sh = batch_sharding(mesh8)
    with mesh8:
        new2, m2 = step(state2, jax.device_put(im, sh),
                        jax.device_put(ma, sh), key)

    assert float(m1.loss) == pytest.approx(float(m2.loss), rel=2e-5)
    assert float(m1.counts.tp) == float(m2.counts.tp)
    for a, b in zip(jax.tree.leaves(new1.params),
                    jax.tree.leaves(new2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)

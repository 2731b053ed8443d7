"""Int8 post-training quantization of the serving path (train/quantize.py).

Validates against the float serving path the same artifacts the reference's
Trainer.test() (/root/reference/utils/trainer.py:186+) would produce: the
binarized masks must be essentially identical.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ddti_tpu.models import AttentionUNet, ResUNet, UNet
from ddti_tpu.train.checkpoint import save_variables_npz
from ddti_tpu.train.export import load_serving_bundle, make_serve_fn
from ddti_tpu.train.fold_bn import fold_batchnorm
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"
from ddti_tpu.train.quantize import (
    build_quant_tree,
    calibrate_conv_amax,
    export_serving_int8,
    quantize_serving,
    quantized_apply,
    strip_quantized_kernels,
)


def _init(model, shape=(4, 64, 64, 1), seed=0):
    x = jax.random.uniform(jax.random.PRNGKey(seed), shape)
    vs = model.init({"params": jax.random.PRNGKey(seed + 1)}, x, train=False)
    return vs["params"], vs["batch_stats"], x


def _balance_logits(model, params, stats, x):
    """Shift the head bias so logits straddle 0 — random-init logits are
    one-sided, which would make mask-agreement checks vacuous."""
    logits = model.apply({"params": params, "batch_stats": stats}, x,
                         train=False)
    if isinstance(logits, tuple):
        logits = logits[0]
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["final_conv"]["bias"] = (params["final_conv"]["bias"]
                                    - jnp.mean(logits))
    return params


def _mask_stats(a, b):
    a = np.asarray(a).astype(bool)
    b = np.asarray(b).astype(bool)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float((a == b).mean()), inter / max(union, 1), a.mean()


def test_calibration_covers_every_conv():
    model = UNet(in_channels=1, out_channels=1, base_filters=8, depth=2)
    params, stats, x = _init(model)
    amax = calibrate_conv_amax(model, {"params": params,
                                       "batch_stats": stats}, x)

    # count nn.Conv param nodes (4D kernels) in the tree
    def count_convs(tree, path=()):
        n = 0
        for k, v in tree.items():
            if isinstance(v, dict):
                if "kernel" in v and np.ndim(v["kernel"]) == 4:
                    n += 1
                else:
                    n += count_convs(v, path + (k,))
        return n

    # every 4D conv kernel (nn.Conv AND the decoder nn.ConvTranspose
    # upconvs) gets an activation scale
    assert len(amax) > 0
    assert len(amax) == count_convs(params)
    assert all(v >= 0 for v in amax.values())

    qtree = build_quant_tree(params, amax)
    leaves = {p for p, _ in amax.items()}
    for path in leaves:
        node = qtree
        for k in path:
            node = node[k]
        assert node["wq"].dtype == jnp.int8
        kernel = params
        for k in path:
            kernel = kernel[k]
        assert node["sw"].shape == (kernel["kernel"].shape[-1],)
        assert node["sx"].shape == ()


@pytest.mark.parametrize("model_cls", [ResUNet, AttentionUNet])
def test_int8_masks_match_f32(model_cls):
    model = model_cls(in_channels=1, out_channels=1, base_filters=16,
                      depth=3)
    params, stats, x = _init(model, shape=(4, 64, 64, 1))
    params = _balance_logits(model, params, stats, x)

    fparams, fstats = fold_batchnorm(model, params, stats)
    masks_f = make_serve_fn(model, fparams, fstats)(x)
    pos = float(np.asarray(masks_f).mean())
    assert 0.05 < pos < 0.95, "balanced logits needed for a meaningful test"

    qv = quantize_serving(model, params, stats, x)
    logits_q = quantized_apply(model, qv, x, train=False)
    if isinstance(logits_q, tuple):
        logits_q = logits_q[0]
    masks_q = (jax.nn.sigmoid(logits_q.astype(jnp.float32)) > 0.5)

    pixel, iou, _ = _mask_stats(masks_f, masks_q)
    assert pixel >= 0.97, f"pixel agreement {pixel}"
    assert iou >= 0.94, f"mask IoU agreement {iou}"

    logits_f = model.apply({"params": fparams, "batch_stats": fstats}, x,
                           train=False)
    err = float(jnp.max(jnp.abs(logits_q - logits_f)))
    scale = float(jnp.max(jnp.abs(logits_f)))
    assert err <= 0.08 * scale, f"logit error {err} vs range {scale}"
    # any pixel that flips must sit at the decision boundary (|logit| small)
    disagree = np.asarray(masks_f).astype(bool) != np.asarray(masks_q)
    if disagree.any():
        worst = float(jnp.max(jnp.abs(jnp.where(disagree, logits_f, 0.0))))
        assert worst <= 0.1 * scale, f"confident pixel flipped: {worst}"


def test_remat_model_quantizes():
    """Quantizing a remat=True model must not leak tracers: calibration's
    amax side-channel dict would capture values from nn.remat's inner
    jax.checkpoint trace (regression: 512^2 --remat checkpoints crashed
    quantize with UnexpectedTracerError). Calibration runs a remat-free
    clone; tables and the quantized graph must match the remat=False run
    exactly (remat never changes params or numerics)."""
    kw = dict(in_channels=1, out_channels=1, base_filters=8, depth=2)
    model_r = ResUNet(**kw, remat=True)
    model_p = ResUNet(**kw)
    params, stats, x = _init(model_r, shape=(2, 32, 32, 1))

    qv_r = quantize_serving(model_r, params, stats, x)
    qv_p = quantize_serving(model_p, params, stats, x)
    jax.tree.map(np.testing.assert_array_equal, qv_r, qv_p)

    out_r = quantized_apply(model_r, qv_r, x, train=False)
    out_p = quantized_apply(model_p, qv_p, x, train=False)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p),
                               atol=1e-6)


def test_conv_transpose_geometry_exact():
    """The k=2/s=2 decoder upconv: int8 interception equals flax
    nn.ConvTranspose bit-for-bit on integer-valued data."""

    class Up(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.ConvTranspose(4, (2, 2), strides=(2, 2),
                                    padding="VALID", use_bias=True,
                                    name="up1")(x)

    m = Up()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-50, 50, (2, 8, 8, 3)).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(
        lambda a: jnp.clip(jnp.round(a * 64), -127, 127), vs["params"])
    qtree = build_quant_tree(jax.device_get(params), {("up1",): 1.0})
    node = qtree["up1"]
    node["wq"] = params["up1"]["kernel"].astype(jnp.int8)
    node["sw"] = jnp.ones_like(node["sw"])
    node["sx"] = jnp.float32(1.0)
    want = m.apply({"params": params}, x)
    got = quantized_apply(m, {"params": params, "quant": qtree}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-2)


def test_legacy_unfoldable_model_quantizes():
    """LegacyUNet's Conv->ReLU->BN order can't fold BN; quantize_serving
    falls back to the unfolded graph (eval-mode BN is a float affine after
    the dequantized conv) and still serves accurate masks."""
    from ddti_tpu.models import LegacyUNet

    model = LegacyUNet(in_channels=1, out_channels=1)
    params, stats, x = _init(model, shape=(2, 32, 32, 1))
    params = _balance_logits(model, params, stats, x)
    qv = quantize_serving(model, params, stats, x)
    logits_q = quantized_apply(model, qv, x, train=False)
    logits_f = model.apply({"params": params, "batch_stats": stats}, x,
                           train=False)
    masks_f = np.asarray(logits_f) > 0
    masks_q = np.asarray(logits_q) > 0
    pixel, iou, _ = _mask_stats(masks_f, masks_q)
    assert pixel >= 0.97, f"pixel agreement {pixel}"
    err = float(jnp.max(jnp.abs(logits_q - logits_f)))
    assert err <= 0.08 * float(jnp.max(jnp.abs(logits_f)))


def test_min_channels_mixed_quantization():
    """min_channels quantizes only deep channel-heavy convs; shallow
    levels stay float (the HBM-bound ones, PERF_NOTES) and the graph
    still serves."""
    model = ResUNet(in_channels=1, out_channels=1, base_filters=16,
                    depth=3)
    params, stats, x = _init(model)
    qv_all = quantize_serving(model, params, stats, x)
    qv_mix = quantize_serving(model, params, stats, x, min_channels=32)

    def int8_leaves(qv):
        return sum(1 for a in jax.tree_util.tree_leaves(qv["quant"])
                   if a.dtype == jnp.int8)

    assert 0 < int8_leaves(qv_mix) < int8_leaves(qv_all)
    # every quantized conv in the mixed tree is channel-heavy
    def walk(t, path=()):
        for k, v in t.items():
            if isinstance(v, dict):
                if "wq" in v:
                    yield path + (k,), v["wq"]
                else:
                    yield from walk(v, path + (k,))
    for p, wq in walk(qv_mix["quant"]):
        assert max(wq.shape[2:]) >= 32, (p, wq.shape)
    logits = quantized_apply(model, qv_mix, x, train=False)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_transunet_quantizes_and_folds():
    """TransUNet: fold_bn validates at the model's native image_size (its
    pos_emb constrains the input resolution) and the int8 graph serves.
    Regression for the hardcoded 32x32 fold validation example."""
    from ddti_tpu.models import create_model

    model = create_model("TransUNet", base_filters=8, depth=3,
                         image_size=64, num_transformer_layers=1,
                         num_heads=4, embed_dim=32)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 1))
    vs = model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    qv = quantize_serving(model, vs["params"], vs["batch_stats"], x)
    logits = quantized_apply(model, qv, x, train=False)
    assert logits.shape == (2, 64, 64, 1)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_unquantized_convs_fall_back_exactly():
    """Convs without a quant table run the plain float path unchanged."""
    model = UNet(in_channels=1, out_channels=1, base_filters=8, depth=2)
    params, stats, x = _init(model)
    want = model.apply({"params": params, "batch_stats": stats}, x,
                       train=False)
    got = quantized_apply(
        model, {"params": params, "batch_stats": stats, "quant": {}}, x,
        train=False)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_strip_kernels_shrinks_bundle():
    model = UNet(in_channels=1, out_channels=1, base_filters=16, depth=3)
    params, stats, x = _init(model)
    amax = calibrate_conv_amax(model, {"params": params,
                                       "batch_stats": stats}, x)
    stripped = strip_quantized_kernels(params, amax)
    for path in amax:
        node = stripped
        for k in path:
            node = node[k]
        assert node["kernel"].shape == (1,)
    # original tree untouched
    node = params
    for k in next(iter(amax)):
        node = node[k]
    assert node["kernel"].ndim == 4

    with tempfile.TemporaryDirectory() as d:
        qv = quantize_serving(model, params, stats, x)
        save_variables_npz(os.path.join(d, "q.npz"), qv)
        save_variables_npz(os.path.join(d, "f.npz"),
                           {"params": params, "batch_stats": stats})
        q_sz = os.path.getsize(os.path.join(d, "q.npz"))
        f_sz = os.path.getsize(os.path.join(d, "f.npz"))
        assert q_sz < 0.5 * f_sz, (q_sz, f_sz)


def test_int8_bundle_roundtrip():
    """export_serving_int8 -> .stablehlo + .npz -> load_serving_bundle
    reproduces the live quantized masks from uint8 inputs."""
    model = ResUNet(in_channels=1, out_channels=1, base_filters=8, depth=2)
    params, stats, x = _init(model, shape=(2, 32, 32, 1))
    params = _balance_logits(model, params, stats, x)

    blob, variables = export_serving_int8(
        model, params, stats, batch=2, size=32, calib_images=x)
    images_u8 = jnp.asarray((np.asarray(x) * 255).astype(np.uint8))

    with tempfile.TemporaryDirectory() as d:
        pp = os.path.join(d, "m_serving_program.stablehlo")
        with open(pp, "wb") as f:
            f.write(blob)
        save_variables_npz(pp[: -len(".stablehlo")] + ".npz", variables)
        fn, batch, size, dt = load_serving_bundle(pp)
        assert (batch, size) == (2, 32) and dt == jnp.uint8
        masks = fn(images_u8)

    # live quantized graph on the same uint8 pipeline
    compute = getattr(model, "dtype", None) or jnp.float32
    logits = quantized_apply(model, variables,
                             images_u8.astype(compute) / 255.0, train=False)
    want = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5)
    assert masks.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(masks).astype(bool),
                                  np.asarray(want))


@pytest.mark.parametrize("conv_kwargs", [
    dict(padding=1),                                      # zoo 3x3
    dict(padding="SAME"),                                 # zoo 1x1 default
    dict(padding=2, kernel_dilation=(2, 2)),              # ASPP branch
    dict(padding=1, strides=(2, 2), use_bias=True),       # strided
    dict(padding=[(0, 1), (2, 0)]),                       # asymmetric pairs
])
def test_conv_geometry_exact(conv_kwargs):
    """The interceptor reproduces flax's conv geometry exactly: with
    identity scales and integer-valued inputs/kernels in int8 range, the
    int8 conv equals the float conv bit-for-bit."""

    class One(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            return nn.Conv(4, (3, 3), name="conv1",
                           **{"use_bias": False, **conv_kwargs})(x)

    m = One()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-50, 50, (2, 16, 16, 3)).astype(np.float32))
    vs = m.init(jax.random.PRNGKey(0), x)
    # snap params to int8-range integers so quantization is lossless
    params = jax.tree_util.tree_map(
        lambda a: jnp.clip(jnp.round(a * 64), -127, 127), vs["params"])
    qtree = build_quant_tree(jax.device_get(params), {("conv1",): 1.0})
    node = qtree["conv1"]
    node["wq"] = params["conv1"]["kernel"].astype(jnp.int8)
    node["sw"] = jnp.ones_like(node["sw"])
    node["sx"] = jnp.float32(1.0)
    want = m.apply({"params": params}, x)
    got = quantized_apply(m, {"params": params, "quant": qtree}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-2)


def test_quantize_cli_min_channels_auto(tmp_path):
    """--min_channels auto exports both candidates, keeps the faster, and
    leaves no temp variant files behind."""
    from ddti_tpu.cli.quantize import main
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz

    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    ck = os.path.join(tmp_path, "w.npz")
    save_params_npz(ck, v["params"], v["batch_stats"])
    out = os.path.join(tmp_path, "q")
    rc = main(["--checkpoint", ck, "--output", out, "--model_type", "UNet",
               "--base_filters", "8", "--depth", "3", "--image_size", "32",
               "--batch_size", "2", "--calib_count", "4",
               "--min_channels", "auto", "--cpu",
               "--compilation_cache", "off"])
    assert rc == 0
    left = sorted(os.listdir(tmp_path))
    assert left == ["q_serving_program.npz", "q_serving_program.stablehlo",
                    "w.npz"]
    fn, batch, size, dt = load_serving_bundle(
        out + "_serving_program.stablehlo")
    assert (batch, size) == (2, 32)
    masks = np.asarray(fn(jnp.zeros((2, 32, 32, 1), jnp.float32)))
    assert masks.shape == (2, 32, 32, 1) and masks.dtype == np.uint8


def test_quantize_cli_batch_set_exports_multi_bundles(tmp_path):
    """--batch_size 1,4 exports one bundle per batch (the multi-program
    serving set) and each loads at its own shape."""
    from ddti_tpu.cli.quantize import main
    from ddti_tpu.models import create_model
    from ddti_tpu.train.checkpoint import save_params_npz

    model = create_model("UNet", base_filters=8, depth=3)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 32, 32, 1)), train=False)
    ck = os.path.join(tmp_path, "w.npz")
    save_params_npz(ck, v["params"], v["batch_stats"])
    out = os.path.join(tmp_path, "q")
    rc = main(["--checkpoint", ck, "--output", out, "--model_type", "UNet",
               "--base_filters", "8", "--depth", "3", "--image_size", "32",
               "--batch_size", "4,1", "--calib_count", "4", "--cpu",
               "--compilation_cache", "off"])
    assert rc == 0
    for bn in (1, 4):
        fn, batch, size, _ = load_serving_bundle(
            out + f"_b{bn}_serving_program.stablehlo")
        assert (batch, size) == (bn, 32)
        masks = np.asarray(fn(jnp.zeros((bn, 32, 32, 1), jnp.float32)))
        assert masks.shape == (bn, 32, 32, 1)


def test_circular_padding_conv_not_quantizable():
    """flax implements padding='CIRCULAR' by wrap-padding inside
    __call__, which the quant interceptor bypasses — such convs must fall
    back to the float path instead of crashing lax.conv."""
    from flax import linen as nn

    from ddti_tpu.train.quantize import _is_plain_conv

    assert _is_plain_conv(nn.Conv(8, (3, 3), padding="SAME"))
    assert _is_plain_conv(nn.Conv(8, (3, 3), padding=1))
    assert not _is_plain_conv(nn.Conv(8, (3, 3), padding="CIRCULAR"))


def test_fused_pipeline_matches_legacy_host_path():
    """The one-program device pipeline (calibrate_and_quantize, the
    quantize_serving default) must produce the same quant tables as the
    legacy host-side path (calibrate_conv_amax + build_quant_tree):
    int8 weights exactly, scales to f32 ulp (XLA may emit the /127 as a
    reciprocal multiply — observed 1e-10 on identical inputs)."""
    from ddti_tpu.train.quantize import calibrate_and_quantize

    model = ResUNet(in_channels=1, out_channels=1, base_filters=8, depth=3)
    params, stats, x = _init(model)
    fparams, fstats = fold_batchnorm(model, params, stats)
    variables = {"params": fparams, "batch_stats": fstats}

    fused = calibrate_and_quantize(model, variables, x)

    amax = calibrate_conv_amax(model, variables, x)
    legacy = build_quant_tree(fparams, amax)

    flat_f = jax.tree_util.tree_leaves_with_path(fused)
    flat_l = jax.tree_util.tree_leaves_with_path(legacy)
    assert [p for p, _ in flat_f] == [p for p, _ in flat_l]
    for (path, a), (_, b) in zip(flat_f, flat_l):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int8:
            np.testing.assert_array_equal(a, b, err_msg=str(path))
        else:
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=0,
                                       err_msg=str(path))


def test_fused_pipeline_min_channels_matches_legacy():
    from ddti_tpu.train.quantize import _quant_paths, calibrate_and_quantize

    model = ResUNet(in_channels=1, out_channels=1, base_filters=8, depth=3)
    params, stats, x = _init(model)
    variables = {"params": params, "batch_stats": stats}
    fused = calibrate_and_quantize(model, variables, x, min_channels=32)
    amax = calibrate_conv_amax(model, variables, x)
    amax = {p: a for p, a in amax.items()
            if max(params_get(params, p)["kernel"].shape[2:]) >= 32}
    assert sorted(_quant_paths(fused)) == sorted(amax)


def params_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree

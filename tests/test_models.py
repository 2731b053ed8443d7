"""Model zoo tests: parameter-count parity with the torch reference
(golden counts extracted by running /root/reference/models/mod.py once),
forward shapes, jit-compilability, gradient finiteness, deep supervision."""

import jax
import jax.numpy as jnp
import pytest

from ddti_tpu.models import MODEL_REGISTRY, create_model

# Golden trainable-parameter counts from the torch reference
# (in_channels=1, out_channels=1). TransUNet counts depend on image_size
# (positional embedding); golden values are at the reference default 512.
GOLDEN_BF16_D3 = {
    "UNet": 482449,
    "ResUNet": 503969,
    "ASPPUNet": 621457,
    "AttentionUNet": 488226,
    "TransUNet": 4484817,   # image_size=512
    "VNet2D": 503855,
    "ImprovedVNet": 509618,
}
GOLDEN_BF32_D4 = {
    "UNet": 7762465,
    "ResUNet": 8110657,
    "ASPPUNet": 9989665,
    "AttentionUNet": 7851197,
    "TransUNet": 7511841,   # image_size=512
    "VNet2D": 8110163,
    "ImprovedVNet": 8198877,
}


def _n_params(model, size):
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, size, size, 1)), train=False)
    return sum(int(p.size) for p in jax.tree.leaves(v["params"])), v


@pytest.mark.parametrize("name", [
    # TransUNet inits its 512-sized pos-emb here (~16 s) -> full tier
    pytest.param(n, marks=pytest.mark.slow) if n == "TransUNet" else n
    for n in sorted(MODEL_REGISTRY)])
def test_param_parity_bf16_d3(name):
    kwargs = dict(in_channels=1, out_channels=1, base_filters=16, depth=3)
    if name == "TransUNet":
        kwargs["image_size"] = 512
    model = create_model(name, **kwargs)
    # init at a small size; TransUNet pos-emb is sized by image_size, and a
    # forward at 512 would be slow — check shape consistency separately.
    size = 512 if name == "TransUNet" else 32
    n, _ = _n_params(model, size)
    assert n == GOLDEN_BF16_D3[name]


@pytest.mark.slow
@pytest.mark.parametrize("name", ["ResUNet", "TransUNet", "ImprovedVNet"])
def test_param_parity_bf32_d4(name):
    kwargs = dict(in_channels=1, out_channels=1, base_filters=32, depth=4)
    if name == "TransUNet":
        kwargs["image_size"] = 512
    model = create_model(name, **kwargs)
    size = 512 if name == "TransUNet" else 32
    n, _ = _n_params(model, size)
    assert n == GOLDEN_BF32_D4[name]


@pytest.mark.parametrize("name", sorted(MODEL_REGISTRY))
def test_forward_shape_and_jit(name):
    kwargs = dict(in_channels=1, out_channels=1, base_filters=8, depth=3)
    if name == "TransUNet":
        kwargs.update(image_size=32, embed_dim=32, num_heads=4,
                      num_transformer_layers=1)
    model = create_model(name, **kwargs)
    x = jnp.zeros((2, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    fwd = jax.jit(lambda p, x: model.apply(p, x, train=False))
    y = fwd(v, x)
    assert y.shape == (2, 32, 32, 1)
    assert jnp.all(jnp.isfinite(y))


def test_multichannel_output():
    model = create_model("UNet", in_channels=3, out_channels=2,
                         base_filters=8, depth=3)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert model.apply(v, x, train=False).shape == (1, 32, 32, 2)


def test_deep_supervision_heads():
    model = create_model("ImprovedVNet", base_filters=8, depth=3,
                         deep_supervision=True)
    x = jnp.zeros((1, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, ds = model.apply(v, x, train=False)
    assert out.shape == (1, 32, 32, 1)
    assert [d.shape[1] for d in ds] == [8, 16, 32]


def test_improvedvnet_no_attention_param_count_changes():
    a = create_model("ImprovedVNet", base_filters=8, depth=3,
                     use_attention=True)
    b = create_model("ImprovedVNet", base_filters=8, depth=3,
                     use_attention=False)
    na, _ = _n_params(a, 32)
    nb, _ = _n_params(b, 32)
    assert na > nb


@pytest.mark.slow  # the fast tier compiles+checks a full backward via
# test_train_parity.py::test_train_step_parity[UNet] already
@pytest.mark.parametrize("name", ["UNet", "ResUNet", "VNet2D"])
def test_gradients_finite(name):
    model = create_model(name, base_filters=8, depth=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    y = (jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 1)) > 0.7
         ).astype(jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.mean((jax.nn.sigmoid(out) - y) ** 2)

    grads = jax.grad(loss_fn)(v["params"])
    assert all(bool(jnp.all(jnp.isfinite(g)))
               for g in jax.tree.leaves(grads))
    assert any(float(jnp.abs(g).max()) > 0 for g in jax.tree.leaves(grads))


def test_batchnorm_stats_update():
    model = create_model("UNet", base_filters=8, depth=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    _, updates = model.apply(v, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(updates["batch_stats"])
    assert any(float(jnp.abs(a - b).max()) > 0
               for a, b in zip(before, after))


def test_create_model_unknown_raises():
    with pytest.raises(NotImplementedError):
        create_model("NoSuchNet")


def test_create_model_tolerates_extra_kwargs():
    m = create_model("UNet", base_filters=8, depth=3, bogus_flag=True)
    assert m.base_filters == 8


# ---- legacy variants (reference model.py / vnet.py) ----

@pytest.mark.slow
def test_legacy_unet_param_parity():
    from ddti_tpu.models import LegacyUNet
    m = LegacyUNet()
    _, v = (lambda mm: (None, mm.init({"params": jax.random.PRNGKey(0)},
                                      jnp.zeros((1, 32, 32, 1)),
                                      train=False)))(m)
    n = sum(int(p.size) for p in jax.tree.leaves(v["params"]))
    assert n == 31042369  # torch reference models/model.py


@pytest.mark.slow
def test_triple_branch_param_parity():
    from ddti_tpu.models import TripleBranchImprovedVNet
    m = TripleBranchImprovedVNet(base_num_filters=16)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((1, 32, 32, 1)), train=False)
    n = sum(int(p.size) for p in jax.tree.leaves(v["params"]))
    assert n == 10041721  # torch reference models/vnet.py at base 16


@pytest.mark.slow
def test_legacy_models_forward_and_dispatch():
    m = create_model("LegacyUNet")
    x = jnp.zeros((1, 32, 32, 1))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 32, 32, 1)
    m2 = create_model("TripleBranchImprovedVNet", base_num_filters=16)
    v2 = m2.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert m2.apply(v2, x, train=False).shape == (1, 32, 32, 1)


def test_features_list_api_adapter():
    # legacy mores.py-style channel-list API maps onto the parametric zoo
    m = create_model("UNet", features=[8, 16, 32])
    assert m.base_filters == 8 and m.depth == 3
    with pytest.raises(ValueError):
        create_model("UNet", features=[8, 24, 32])


@pytest.mark.slow
def test_remat_identical_forward_and_params():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    m1 = create_model("ResUNet", base_filters=8, depth=3, remat=False)
    m2 = create_model("ResUNet", base_filters=8, depth=3, remat=True)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    o1 = m1.apply(v, x, train=False)
    o2 = m2.apply(v, x, train=False)  # same param tree works for both
    assert jnp.allclose(o1, o2, atol=1e-6)

    def loss(model):
        def f(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, x,
                train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    g1 = jax.grad(loss(m1))(v["params"])
    g2 = jax.grad(loss(m2))(v["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        assert jnp.allclose(a, b, atol=1e-5)

    # selective (per-level) remat: same params, same forward, same grads —
    # remat is semantically the identity whatever the level subset
    m3 = create_model("ResUNet", base_filters=8, depth=3, remat=(0, 1))
    o3 = m3.apply(v, x, train=False)
    assert jnp.allclose(o1, o3, atol=1e-6)
    g3 = jax.grad(loss(m3))(v["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g3)):
        assert jnp.allclose(a, b, atol=1e-5)


def test_parse_remat_arg():
    from ddti_tpu.cli.main import parse_remat_arg

    assert parse_remat_arg(True) is True
    assert parse_remat_arg(False) is False
    assert parse_remat_arg("0,1") == (0, 1)
    assert parse_remat_arg("1") == (1,)
    assert parse_remat_arg("1,0,1") == (0, 1)
    import pytest as _pytest
    with _pytest.raises(Exception):
        parse_remat_arg("a,b")
    with _pytest.raises(Exception):  # empty list must not mean full remat
        parse_remat_arg(",")


def test_remat_value_validation():
    """Scalar truthy remat (YAML `remat: 1`) keeps the historical
    full-remat semantics; out-of-range level indices raise instead of
    silently rematting nothing."""
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 1))
    m = create_model("UNet", base_filters=8, depth=3, remat=1)
    m.init({"params": jax.random.PRNGKey(0)}, x, train=False)  # no crash
    bad = create_model("UNet", base_filters=8, depth=3, remat=(0, 5))
    with pytest.raises(ValueError, match="out of range"):
        bad.init({"params": jax.random.PRNGKey(0)}, x, train=False)


def test_upconv_matches_conv_transpose():
    import flax.linen as nn

    from ddti_tpu.models.blocks import UpConv2x

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    ct = nn.ConvTranspose(5, (2, 2), strides=(2, 2), padding="VALID",
                          use_bias=True)
    v = ct.init(jax.random.PRNGKey(1), x)
    up = UpConv2x(5, use_bias=True)
    # identical param tree -> identical outputs
    out_ct = ct.apply(v, x)
    out_up = up.apply(v, x)
    assert jnp.abs(out_up - out_ct).max() < 1e-5


def test_bn_variance_algorithm_switch():
    """QUIRKS #24: set_bn_fast_variance selects the BN variance algorithm
    at trace time. With a large common-mode offset, one-pass
    E[x^2]-E[x]^2 loses precision in f32 while two-pass stays exact —
    the two settings must produce measurably different train-mode
    normalizations, and the default must be restored."""
    import numpy as np

    from ddti_tpu.models.blocks import (
        batch_norm,
        bn_fast_variance,
        set_bn_fast_variance,
    )
    from flax import linen as nn

    class OneBN(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool):
            return batch_norm(train=train)(x)

    # offset >> std: var = E[x^2] - E[x]^2 cancels catastrophically in f32
    rng = np.random.default_rng(0)
    x = (1000.0 + rng.normal(0, 0.1, (4, 16, 16, 8))).astype(np.float32)

    def run():
        m = OneBN()
        v = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                   train=False)
        out, _ = m.apply(v, jnp.asarray(x), train=True,
                         mutable=["batch_stats"])
        return np.asarray(out)

    assert bn_fast_variance()  # production default
    fast = run()
    set_bn_fast_variance(False)
    try:
        slow = run()
    finally:
        set_bn_fast_variance(True)
    # two-pass matches the f64 ground truth much more closely
    mu = x.astype(np.float64).mean(axis=(0, 1, 2))
    var = x.astype(np.float64).var(axis=(0, 1, 2))
    want = ((x - mu) / np.sqrt(var + 1e-5)).astype(np.float32)
    err_fast = np.abs(fast - want).max()
    err_slow = np.abs(slow - want).max()
    assert err_slow < err_fast / 10, (err_slow, err_fast)

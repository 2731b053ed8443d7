"""BatchNorm folding (train/fold_bn.py): folded weights must be
numerically identical (to fp32 tolerance) to the original model in eval
mode, with non-trivial running stats; LegacyUNet's Conv->ReLU->BN order
must be rejected rather than silently misfolded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddti_tpu.models import create_model
from ddti_tpu.train.fold_bn import fold_batchnorm
pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def _randomize_bn(key, params, batch_stats):
    """Give every BN layer non-default scale/bias/mean/var so folding is a
    real transformation (init stats mean=0/var=1 would make it a no-op)."""

    def perturb(tree, fields):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for kp, leaf in leaves:
            path = "/".join(str(getattr(k, "key", k)) for k in kp)
            tail = path.rsplit("/", 1)[-1]
            if tail in fields:
                k = jax.random.fold_in(jax.random.PRNGKey(7), hash(path) % (2**31))
                if tail == "var":
                    leaf = jnp.abs(jax.random.normal(k, leaf.shape)) + 0.3
                else:
                    leaf = jax.random.normal(k, leaf.shape) * 0.5 + (
                        1.0 if tail == "scale" else 0.0)
            out.append(leaf)
        return jax.tree_util.tree_unflatten(treedef, out)

    # only perturb scale/bias leaves that belong to BN modules (have
    # matching mean/var stats); perturbing conv biases too is harmless for
    # this test (they fold through), so keep it simple and perturb by name.
    params = perturb(params, {"scale"})
    batch_stats = perturb(batch_stats, {"mean", "var"})
    return params, batch_stats


@pytest.mark.parametrize("name", ["ResUNet", "ASPPUNet", "AttentionUNet",
                                  "VNet2D", "ImprovedVNet"])
def test_fold_matches_original(name):
    model = create_model(name, in_channels=1, out_channels=1,
                         base_filters=8, depth=3)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, stats = _randomize_bn(jax.random.PRNGKey(2), v["params"],
                                  v["batch_stats"])

    fp, fs = fold_batchnorm(model, params, stats, example=x)

    def logits(p, s):
        out = model.apply({"params": p, "batch_stats": s}, x, train=False)
        return out[0] if isinstance(out, tuple) else out

    want = np.asarray(logits(params, stats))
    got = np.asarray(logits(fp, fs))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # the fold really happened: BN scales are all exactly 1 now
    scales = [leaf for kp, leaf in
              jax.tree_util.tree_flatten_with_path(fp)[0]
              if str(getattr(kp[-1], "key", "")) == "scale"]
    assert scales and all(np.all(np.asarray(s) == 1.0) for s in scales)


def test_fold_conv_bias_rides_through():
    """TripleBranchImprovedVNet's blocks use biased convs before BN; the
    conv bias must fold into the BN bias term."""
    model = create_model("TripleBranchImprovedVNet", in_channels=1,
                         num_classes=1, base_num_filters=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, stats = _randomize_bn(jax.random.PRNGKey(2), v["params"],
                                  v["batch_stats"])
    fp, fs = fold_batchnorm(model, params, stats, example=x)

    def logits(p, s):
        return model.apply({"params": p, "batch_stats": s}, x, train=False)

    np.testing.assert_allclose(np.asarray(logits(fp, fs)),
                               np.asarray(logits(params, stats)),
                               atol=1e-4, rtol=1e-4)


def test_fold_rejects_legacy_unet():
    """LegacyUNet is Conv->ReLU->BN (models/legacy.py:37-51): folding the
    kernel through the ReLU is invalid and must raise, not corrupt."""
    model = create_model("LegacyUNet", in_channels=1, out_channels=1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 1))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, stats = _randomize_bn(jax.random.PRNGKey(2), v["params"],
                                  v["batch_stats"])
    with pytest.raises(ValueError, match="folding changed"):
        fold_batchnorm(model, params, stats, example=x)

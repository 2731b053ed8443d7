"""Torch .pth interop tests: forward parity of imported reference weights
(gated on the reference checkout being present), export roundtrips, and
.pth save/load."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddti_tpu.models import create_model

pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"
from ddti_tpu.train.torch_interop import (
    export_state_dict,
    import_state_dict,
    load_pth,
    save_pth,
)

torch = pytest.importorskip("torch")

REF = "/root/reference"
HAVE_REF = os.path.isdir(os.path.join(REF, "models"))

SMALL = dict(in_channels=1, out_channels=1, base_filters=16, depth=3)
TRANS_KW = dict(num_transformer_layers=2, num_heads=4, embed_dim=32,
                image_size=64)


def _ref_models():
    sys.path.insert(0, REF)
    from models import mod  # noqa: PLC0415
    return mod


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout not mounted")
@pytest.mark.parametrize("name", ["UNet", "ResUNet", "ASPPUNet",
                                  "AttentionUNet", "VNet2D", "ImprovedVNet"])
def test_forward_parity_with_reference(name):
    mod = _ref_models()
    torch.manual_seed(0)
    tm = getattr(mod, name)(**SMALL)
    tm.eval()
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 1)).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)
                 ).permute(0, 2, 3, 1).numpy()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    jm = create_model(name, **SMALL)
    v = jm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                train=False)
    p, s = import_state_dict(name, sd, v["params"], v["batch_stats"])
    out = np.asarray(jm.apply({"params": p, "batch_stats": s},
                              jnp.asarray(x), train=False))
    rel = np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 1e-5, f"{name} rel err {rel}"


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout not mounted")
def test_transunet_parity_quirk_mode():
    """Exact parity requires reproducing the reference's batch-axis
    attention quirk (batch_first=False misuse)."""
    mod = _ref_models()
    torch.manual_seed(0)
    tm = mod.TransUNet(**SMALL, **TRANS_KW)
    tm.eval()
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 1)).astype(
        np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x).permute(0, 3, 1, 2)
                 ).permute(0, 2, 3, 1).numpy()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    jm = create_model("TransUNet", batch_axis_attention=True, **SMALL,
                      **TRANS_KW)
    v = jm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                train=False)
    p, s = import_state_dict("TransUNet", sd, v["params"], v["batch_stats"])
    out = np.asarray(jm.apply({"params": p, "batch_stats": s},
                              jnp.asarray(x), train=False))
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-5


@pytest.mark.parametrize("name", ["ResUNet", "VNet2D"])
def test_export_import_roundtrip(name):
    jm = create_model(name, **SMALL)
    v = jm.init({"params": jax.random.PRNGKey(1)},
                jnp.zeros((1, 32, 32, 1)), train=False)
    sd = export_state_dict(name, v["params"], v["batch_stats"])
    p, s = import_state_dict(name, sd, v["params"], v["batch_stats"])
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(v["batch_stats"]), jax.tree.leaves(s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pth_save_load_roundtrip(tmp_path):
    jm = create_model("ResUNet", **SMALL)
    v = jm.init({"params": jax.random.PRNGKey(2)},
                jnp.zeros((1, 32, 32, 1)), train=False)
    path = os.path.join(tmp_path, "m.pth")
    save_pth(path, "ResUNet", v["params"], v["batch_stats"])
    sd = load_pth(path)
    p, s = import_state_dict("ResUNet", sd, v["params"], v["batch_stats"])
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not HAVE_REF, reason="reference checkout not mounted")
def test_exported_pth_loads_into_reference_model(tmp_path):
    """Our exported .pth must load_state_dict into the torch reference."""
    mod = _ref_models()
    jm = create_model("ResUNet", **SMALL)
    v = jm.init({"params": jax.random.PRNGKey(3)},
                jnp.zeros((1, 32, 32, 1)), train=False)
    path = os.path.join(tmp_path, "m.pth")
    save_pth(path, "ResUNet", v["params"], v["batch_stats"])
    tm = mod.ResUNet(**SMALL)
    missing, unexpected = tm.load_state_dict(
        torch.load(path, weights_only=True), strict=False)
    assert not missing
    assert not unexpected

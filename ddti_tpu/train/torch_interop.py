"""Torch ``.pth`` checkpoint interop.

Imports a reference-format torch ``state_dict`` (the files the reference
saves at /root/reference/utils/trainer.py:184-202 and loads at main.py
:141-142) into this framework's flax param/batch-stat pytrees, and exports
back. This is the parity bridge: a model trained by the torch reference can
be evaluated/fine-tuned here and vice versa.

Key translation is rule-based over the flax tree structure (the zoo was
built with submodule names that mirror the reference's attribute layout):

  flax path                      torch key
  encoders_0/conv1/kernel        encoders.0.0.weight        (ConvBNAct)
  encoders_0/conv1/kernel        encoders.0.conv.0.weight   (ResidualBlock)
  enc_blocks_0/prelu1/...        enc_blocks.0.2.weight      (PReLU blocks)
  attn_gates_1/w_g/...           attn_gates.1.W_g.0.*
  trans_layers_2/qkv/...         trans.layers.2.self_attn.in_proj_*
  ...

Weight layout transforms:
  Conv2d      OIHW   -> HWIO
  ConvT2d     IOHW   -> HWIO  (flax ConvTranspose kernel (kh,kw,in,out);
                               identical math for the k=s=2 non-overlapping
                               taps used throughout the zoo)
  Linear      (o,i)  -> (i,o)
  BatchNorm   weight->scale, bias->bias, running_mean/var->mean/var
  PReLU       (1,)   -> ()
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

# ---------------------------------------------------------------------------
# per-module-kind sequential index maps (flax child name -> torch suffix)

_CONVBN = {"conv1": "0", "bn1": "1", "conv2": "3", "bn2": "4"}
_CONVBN_PRELU = {"conv1": "0", "bn1": "1", "prelu1": "2",
                 "conv2": "3", "bn2": "4", "prelu2": "5"}
_RES = {"conv1": "conv.0", "bn1": "conv.1", "conv2": "conv.3",
        "bn2": "conv.4", "skip": "skip"}
_GATE = {"w_g": "W_g.0", "w_g_bn": "W_g.1", "w_x": "W_x.0",
         "w_x_bn": "W_x.1", "psi": "psi.0", "psi_bn": "psi.1"}
_ASPP = {"branch0": "branches.0", "branch1": "branches.1",
         "branch2": "branches.2", "branch3": "branches.3",
         "project": "project.0", "project_bn": "project.1"}
_TRANS_LAYER = {"qkv": "self_attn.in_proj", "out_proj": "self_attn.out_proj",
                "fc1": "linear1", "fc2": "linear2",
                "ln1": "norm1", "ln2": "norm2"}
# legacy conv_block (model.py:35-42 / mores.py:33-43): Conv(0) ReLU(1) BN(2)
# Conv(3) ReLU(4) BN(5)
_CONV_RELU_BN = {"conv1": "0", "bn1": "2", "conv2": "3", "bn2": "5"}
# mores VNet2D _block (mores.py:105-114): Conv BN PReLU Conv BN PReLU
_MORES_PRELU = {"conv1": "0", "bn1": "1", "prelu1": "2",
                "conv2": "3", "bn2": "4", "prelu2": "5"}


def _block_map(model_type: str, prelu: bool) -> dict:
    if model_type == "ResUNet":
        return _RES
    return _CONVBN_PRELU if prelu else _CONVBN


def _legacy_unet_key(path: tuple[str, ...]) -> str:
    """Key map for the fixed-depth legacy UNet (models/model.py:5-79 ==
    mores.py:5-74): encoder1..4 are plain conv_block Sequentials; middle =
    Sequential(pool(0), conv_block(1), ConvT(2)); decoderN =
    Sequential(conv_block(0), ConvT(1)); final = Sequential(conv_block(0),
    Conv1x1(1))."""
    out: list[str] = []
    i = 0
    while i < len(path):
        p = path[i]
        if p.startswith("encoder"):
            out.append(f"{p}.{_CONV_RELU_BN[path[i + 1]]}")
            i += 2
            continue
        if p == "middle_block":
            out.append(f"middle.1.{_CONV_RELU_BN[path[i + 1]]}")
            i += 2
            continue
        if p == "middle_up":
            out.append("middle.2")
            i += 1
            continue
        if p.startswith("decoder") and p.endswith("_block"):
            out.append(f"{p[:-6]}.0.{_CONV_RELU_BN[path[i + 1]]}")
            i += 2
            continue
        if p.startswith("decoder") and p.endswith("_up"):
            out.append(f"{p[:-3]}.1")
            i += 1
            continue
        if p == "final_block":
            out.append(f"final.0.{_CONV_RELU_BN[path[i + 1]]}")
            i += 2
            continue
        if p == "final_conv":
            out.append("final.1")
            i += 1
            continue
        out.append(p)
        i += 1
    return ".".join(out)


def _mores_vnet_key(path: tuple[str, ...]) -> str:
    """Key map for MoresVNet2D (mores.py:75-135): enc{i}/down{i}/up{i}/
    dec{i}/bottleneck flax modules onto the torch ModuleList names."""
    out: list[str] = []
    i = 0
    while i < len(path):
        p = path[i]
        stem = p.rstrip("0123456789")
        idx = p[len(stem):]
        if stem in ("enc", "dec") and idx:
            out.append(f"{stem}_blocks.{idx}.{_MORES_PRELU[path[i + 1]]}")
            i += 2
            continue
        if p == "bottleneck":
            out.append(f"bottleneck.{_MORES_PRELU[path[i + 1]]}")
            i += 2
            continue
        if stem == "down" and idx:
            out.append(f"down_convs.{idx}")
            i += 1
            continue
        if stem == "up" and idx:
            out.append(f"up_convs.{idx}")
            i += 1
            continue
        out.append(p)
        i += 1
    return ".".join(out)


def _torch_key(model_type: str, path: tuple[str, ...]) -> str:
    """Translate a flax param path (module names + leaf name) to the torch
    state_dict key prefix (without .weight/.bias leaf suffix)."""
    if model_type in ("LegacyUNet", "MoresUNet"):
        return _legacy_unet_key(path)
    if model_type == "MoresVNet2D":
        return _mores_vnet_key(path)
    prelu = model_type == "VNet2D"
    parts = list(path)
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if "_" in p and p.rsplit("_", 1)[-1].isdigit():
            stem, idx = p.rsplit("_", 1)
            if stem == "trans_layers":
                nxt = parts[i + 1]
                out.append(f"trans.layers.{idx}.{_TRANS_LAYER[nxt]}")
                i += 2
                continue
            if stem in ("encoders", "decoders", "enc_blocks", "dec_blocks"):
                out.append(f"{stem}.{idx}")
                nxt = parts[i + 1]
                bm = _block_map(model_type, prelu)
                if nxt in bm:
                    out.append(bm[nxt])
                    i += 2
                    continue
                i += 1
                continue
            if stem == "attn_gates":
                out.append(f"attn_gates.{idx}.{_GATE[parts[i + 1]]}")
                i += 2
                continue
            # upconvs_i, up_convs_i, down_convs_i, pools_i, ds_heads_i
            out.append(f"{stem}.{idx}")
            i += 1
            continue
        if p == "bottleneck":
            out.append("bottleneck")
            nxt = parts[i + 1]
            bm = _block_map(model_type, prelu)
            if model_type == "ImprovedVNet":
                bm = _CONVBN
            if nxt in bm:
                out.append(bm[nxt])
                i += 2
                continue
            i += 1
            continue
        if p == "aspp":
            out.append(f"aspp.{_ASPP[parts[i + 1]]}")
            i += 2
            continue
        if p == "patchify":
            out.append("trans.patchify")
            i += 1
            continue
        out.append(p)
        i += 1
    return ".".join(out)


def _leaf_suffix(leaf: str, kind: str) -> str:
    if kind == "bn":
        return {"scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}[leaf]
    if leaf == "kernel":
        return "weight"
    if leaf == "negative_slope":
        return "weight"
    if leaf == "pos_emb":
        return ""  # parameter itself
    return leaf  # bias


def _is_bn(path: tuple[str, ...]) -> bool:
    return any(p.startswith("bn") or p.endswith("_bn")
               or p in ("ln1", "ln2") for p in path)


def _is_layernorm(path) -> bool:
    return any(p in ("ln1", "ln2") for p in path)


def _is_transpose_conv(model_type: str, path) -> bool:
    def is_up(p: str) -> bool:
        if p.startswith("upconvs_") or p.startswith("up_convs_"):
            return True  # active zoo
        if p == "middle_up" or (p.startswith("decoder")
                                and p.endswith("_up")):
            return True  # legacy UNet / MoresUNet
        stem = p.rstrip("0123456789")
        return stem == "up" and len(p) > len(stem)  # MoresVNet2D up{i}

    return any(is_up(p) for p in path)


def _is_dense(path) -> bool:
    return any(p in ("qkv", "out_proj", "fc1", "fc2", "trans_proj",
                     "fc1", "fc2") for p in path)


def flax_to_torch_key(model_type: str, path: tuple[str, ...]) -> str:
    """Full torch key for one flax leaf path."""
    *mods, leaf = path
    prefix = _torch_key(model_type, tuple(mods))
    if leaf == "pos_emb" and not mods:
        return "trans.pos_emb"
    if _is_layernorm(tuple(mods)):
        suffix = {"scale": "weight", "bias": "bias"}[leaf]
    elif _is_bn(tuple(mods)):
        suffix = _leaf_suffix(leaf, "bn")
    else:
        suffix = _leaf_suffix(leaf, "other")
    # torch MHA packs in_proj as in_proj_weight / in_proj_bias (underscore)
    if prefix.endswith("in_proj"):
        return f"{prefix}_{suffix}"
    return f"{prefix}.{suffix}" if suffix else prefix


def _to_flax_array(model_type: str, path, torch_arr: np.ndarray,
                   target_shape) -> np.ndarray:
    a = np.asarray(torch_arr)
    leaf = path[-1]
    mods = tuple(path[:-1])
    if leaf == "kernel":
        if a.ndim == 4:
            if _is_transpose_conv(model_type, mods):
                # torch ConvTranspose2d applies the kernel in gradient
                # orientation; flax ConvTranspose correlates — spatial flip
                # + IOHW -> HWIO
                a = a[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            else:
                a = a.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif a.ndim == 2:
            a = a.T  # (out,in) -> (in,out)
    if leaf == "negative_slope":
        a = a.reshape(())
    if tuple(a.shape) != tuple(target_shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: torch "
                         f"{a.shape} vs flax {tuple(target_shape)}")
    return a


def _from_flax_array(model_type: str, path, flax_arr: np.ndarray
                     ) -> np.ndarray:
    a = np.asarray(flax_arr)
    leaf = path[-1]
    mods = tuple(path[:-1])
    if leaf == "kernel":
        if a.ndim == 4:
            if _is_transpose_conv(model_type, mods):
                a = a.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
            else:
                a = a.transpose(3, 2, 0, 1)
        elif a.ndim == 2:
            a = a.T
    if leaf == "negative_slope":
        a = a.reshape(1)
    return a


def _iter_leaves(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for kp, leaf in leaves:
        path = tuple(str(getattr(k, "key", getattr(k, "idx", k)))
                     for k in kp)
        yield path, leaf


def import_state_dict(model_type: str, state_dict: dict, params: Any,
                      batch_stats: Any) -> tuple[Any, Any]:
    """Map a torch state_dict onto (params, batch_stats) templates."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()

    def rebuild(tree):
        leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        out = []
        for kp, leaf in leaves:
            path = tuple(str(getattr(k, "key", getattr(k, "idx", k)))
                         for k in kp)
            tk = flax_to_torch_key(model_type, path)
            if tk not in sd:
                raise KeyError(f"torch key {tk!r} (for flax {path}) not in "
                               f"state_dict")
            used.add(tk)
            out.append(_to_flax_array(model_type, path, sd[tk], leaf.shape)
                       .astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, out)

    new_params = rebuild(params)
    new_stats = rebuild(batch_stats)
    leftovers = {k for k in sd if k not in used
                 and not k.endswith("num_batches_tracked")}
    if leftovers:
        raise KeyError(f"unconsumed torch keys: {sorted(leftovers)[:8]}...")
    return new_params, new_stats


def export_state_dict(model_type: str, params: Any, batch_stats: Any
                      ) -> dict:
    """Flax -> torch-format state_dict (numpy arrays)."""
    sd = {}
    for tree in (params, batch_stats):
        for path, leaf in _iter_leaves(tree):
            tk = flax_to_torch_key(model_type, path)
            sd[tk] = _from_flax_array(model_type, path, leaf)
    return sd


def load_pth(path: str) -> dict:
    """Load a torch .pth state_dict as numpy arrays (CPU torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def save_pth(path: str, model_type: str, params: Any, batch_stats: Any
             ) -> None:
    import torch

    sd = {k: torch.tensor(np.ascontiguousarray(v))
          for k, v in export_state_dict(model_type, params,
                                        batch_stats).items()}
    torch.save(sd, path)

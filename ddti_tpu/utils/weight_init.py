"""Weight initializers — the working equivalent of the reference's
never-called ``init_weights`` (/root/reference/utils/utils.py:253-258):
Kaiming-normal (fan_out, relu) for conv kernels, Xavier-normal for dense
kernels. Apply to an initialized param tree with ``apply_init``."""

from __future__ import annotations

import jax
from flax import linen as nn

kaiming_conv = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")          # kaiming_normal_(mode='fan_out', relu)
xavier_dense = nn.initializers.xavier_normal()


def apply_init(key: jax.Array, params):
    """Re-initialize every conv (4D) kernel with Kaiming-normal and every
    dense (2D) kernel with Xavier-normal; leaves biases/BN/other params
    untouched. Returns a new param tree."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for k, (kp, leaf) in zip(keys, leaves):
        name = str(getattr(kp[-1], "key", kp[-1]))
        if name == "kernel" and leaf.ndim == 4:
            out.append(kaiming_conv(k, leaf.shape, leaf.dtype))
        elif name == "kernel" and leaf.ndim == 2:
            out.append(xavier_dense(k, leaf.shape, leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)

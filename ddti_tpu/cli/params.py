"""Model-zoo parameter counter — the ``python test.py`` equivalent.

The reference tool (/root/reference/test.py:5-17) counts the LEGACY zoo:
UNet (models/model.py), VNet2D/TransUNet/ResUNet/ASPPUNet/AttentionUNet
(models/mores.py), ImprovedVNet (models/vnet.py) — all default ctors with
1-channel in/out, i.e. 512-based TransUNet positional embeddings. The
first section prints exactly that set (same order, same architectures via
the faithful ports) so the numbers line up with the torch output; the
second section covers the ACTIVE parametric zoo the training CLI uses.

Counting uses ``jax.eval_shape`` — no arrays are materialized, so even
the 160M-parameter triple-branch net costs milliseconds.
"""

from __future__ import annotations

import math
import sys


def _count(model, size: int) -> int:
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, size, size, 1)), train=False))
    return sum(math.prod(leaf.shape)
               for leaf in jax.tree.leaves(shapes["params"]))


def main(argv=None) -> int:
    import jax

    # parameter counting needs no accelerator; eager init over a TPU
    # tunnel is needlessly slow
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from ddti_tpu.models import MODEL_REGISTRY, create_model

    # the reference test.py set, in its order (test.py:8-14): legacy
    # architectures at their torch-default configurations, 512px
    reference_set = [
        ("UNet", "LegacyUNet"),
        ("VNet2D", "MoresVNet2D"),
        ("ImprovedVNet", "TripleBranchImprovedVNet"),
        ("TransUNet", "MoresTransUNet"),
        ("ResUNet", "MoresResUNet"),
        ("ASPPUNet", "MoresASPPUNet"),
        ("AttentionUNet", "MoresAttentionUNet"),
    ]
    print("# reference test.py set (legacy zoo, torch-default ctors)")
    for ref_name, port_name in reference_set:
        n = _count(create_model(port_name), 512)
        print(f"{ref_name}: {n}")

    print("# active zoo (models/mod.py equivalents, default ctors)")
    for name, cls in MODEL_REGISTRY.items():
        n = _count(cls(in_channels=1, out_channels=1), 512)
        print(f"{name}: {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Model-zoo parameter counter — the ``python test.py`` equivalent
(/root/reference/test.py:5-17): instantiates every zoo model with 1-channel
in/out and prints the trainable parameter count."""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    import jax

    # parameter counting needs no accelerator; eager init over a TPU
    # tunnel is needlessly slow
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp

    from ddti_tpu.models import MODEL_REGISTRY
    from ddti_tpu.train import count_params

    key = jax.random.PRNGKey(0)
    size = 64  # tiny spatial size; parameter counts are size-independent
    # except TransUNet's positional embedding, which follows image_size.
    for name, cls in MODEL_REGISTRY.items():
        kwargs = dict(in_channels=1, out_channels=1)
        if name == "TransUNet":
            kwargs["image_size"] = size
        model = cls(**kwargs)
        variables = model.init({"params": key},
                               jnp.zeros((1, size, size, 1)), train=False)
        print(f"{name}: {count_params(variables['params'])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Device mesh construction and sharding rules.

The reference's only parallelism is single-process ``nn.DataParallel``
(/root/reference/utils/trainer.py:28-32). The TPU-native replacement is
single-controller JAX: one ``jax.sharding.Mesh`` over the slice's ICI links,
batch-sharded (DP) inputs plus optional **spatial partitioning** of the
height axis (XLA GSPMD inserts the halo exchanges for convolutions
automatically), with gradient/metric reductions emitted by XLA as ICI
collectives. There is no NCCL/MPI analogue to port — collectives come from
sharding annotations, not user code.

Axes:
  "data"  — batch sharding (DP). Always present.
  "model" — optional spatial partitioning of H (a simple form of model/
            sequence parallelism for conv nets; useful at 512x512+).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[dict] = None,
              devices: Optional[list] = None) -> Mesh:
    """Build a mesh. ``shape`` like {"data": 4, "model": 2}; defaults to all
    devices on the "data" axis."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"data": len(devices)}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    n = int(np.prod(dims))
    if n != len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, "
                         f"have {len(devices)}")
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, names)


def parse_mesh_spec(spec: str) -> dict:
    """Parse a ``--mesh`` CLI value like ``'data=4,model=2'`` into a mesh
    shape dict (insertion order = mesh axis order)."""
    out = {}
    for part in spec.split(","):
        if not part.strip():
            continue
        name, _, val = part.partition("=")
        name = name.strip()
        if not name or not val.strip().isdigit():
            raise ValueError(f"bad mesh spec {spec!r}; expected "
                             f"'data=N[,model=M]'")
        out[name] = int(val)
    if not out:
        raise ValueError("empty mesh spec")
    return out


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """Sharding for (N, H, W, C) batches: N over "data", optionally H over
    "model"."""
    if spatial and "model" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "model", None, None))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, arrays, spatial: bool = False):
    """Device-put a pytree of (N, ...) host arrays with batch sharding."""
    sh = batch_sharding(mesh, spatial)
    return jax.tree.map(lambda a: jax.device_put(a, sh), arrays)


def train_state_sharding(mesh: Mesh, state) -> "jax.tree":
    """Replicate all train-state leaves (params/opt state are tiny next to
    activations for this model family; DP keeps them replicated so the
    update is local and only gradients ride the ICI as psums)."""
    rep = replicated(mesh)
    return jax.tree.map(lambda _: rep, state)

"""Multi-host (DCN) launch helper.

One process per host, all hosts joined into one JAX runtime via
``jax.distributed.initialize`` — the scale-out path past a single host
that the reference (single-process ``nn.DataParallel``,
/root/reference/utils/trainer.py:28-32) has no analogue for. After
initialization, the existing mesh/pjit code is unchanged: ``jax.devices()``
spans every host, ``make_mesh`` lays DP over the global device set, and
XLA routes intra-slice collectives over ICI and cross-host ones over DCN.

Launch on each host (or let a scheduler set the env):

    ddti-train ... --multihost --coordinator host0:8476 \
        --num_processes 4 --process_id $RANK

or with env vars JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID (flags win over env; on TPU pods with none set, JAX
autodetects from the TPU metadata and every argument may be omitted).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Mapping, Optional

import jax
import numpy as np


@dataclass
class MultihostSpec:
    """Resolved arguments for ``jax.distributed.initialize``. ``None``
    fields are left for JAX's own autodetection (TPU pod metadata)."""

    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


def spec_from(coordinator: Optional[str] = None,
              num_processes: Optional[int] = None,
              process_id: Optional[int] = None,
              env: Optional[Mapping[str, str]] = None) -> MultihostSpec:
    """Merge explicit arguments over environment variables. Explicit
    values win; env fallbacks are JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID. Partial specs raise."""
    env = os.environ if env is None else env
    coordinator = coordinator or env.get("JAX_COORDINATOR_ADDRESS") or None

    def _int(value, key):
        if value is not None:
            return int(value)
        raw = env.get(key)
        return int(raw) if raw not in (None, "") else None

    num_processes = _int(num_processes, "JAX_NUM_PROCESSES")
    process_id = _int(process_id, "JAX_PROCESS_ID")

    given = [coordinator is not None, num_processes is not None,
             process_id is not None]
    if any(given) and not all(given):
        raise ValueError(
            "multi-host launch needs all three of coordinator address, "
            f"num_processes and process_id (or none, for TPU-pod "
            f"autodetection); got coordinator={coordinator!r}, "
            f"num_processes={num_processes!r}, process_id={process_id!r}")
    if num_processes is not None:
        if num_processes < 1:
            raise ValueError(f"num_processes must be >= 1, "
                             f"got {num_processes}")
        if not 0 <= process_id < num_processes:
            raise ValueError(f"process_id {process_id} out of range for "
                             f"{num_processes} processes")
    return MultihostSpec(coordinator, num_processes, process_id)


def initialize_multihost(spec: Optional[MultihostSpec] = None) -> None:
    """Join this process into the global JAX runtime. Safe to call once
    per process, before first device use. With a fully-empty spec on
    non-pod hardware this is a no-op (single-process run)."""
    spec = spec or spec_from()
    if (spec.coordinator_address is None and spec.num_processes is None
            and not _on_tpu_pod()):
        return  # plain single-process run; nothing to initialize
    jax.distributed.initialize(
        coordinator_address=spec.coordinator_address,
        num_processes=spec.num_processes,
        process_id=spec.process_id)


def _on_tpu_pod() -> bool:
    """Best-effort detection of TPU-pod metadata that lets
    jax.distributed.initialize autodetect all arguments."""
    return bool(os.environ.get("TPU_WORKER_HOSTNAMES")
                or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))


def process_local_batch(global_arrays, mesh) -> "jax.Array":
    """Assemble global batch-sharded jax.Arrays from per-process host
    shards: each process passes only ITS slice of the global batch (shape
    (global_batch / process_count, ...)); addressable devices get their
    data locally and no cross-host copy happens.

    This is the multi-host data-feeding pattern: the global array is
    logically (global_batch, ...) but each host only ever materializes
    its own rows.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def one(local):
        local = np.asarray(local)
        global_shape = (local.shape[0] * jax.process_count(),
                        *local.shape[1:])
        sharding = NamedSharding(mesh, P("data"))
        return jax.make_array_from_process_local_data(
            sharding, local, global_shape)

    return jax.tree.map(one, global_arrays)

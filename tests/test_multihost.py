"""Multi-host launch helper (parallel/multihost.py): spec resolution from
flags/env, and a REAL two-process jax.distributed run over localhost DCN —
two CPU processes join one runtime, build a global 2-device mesh, feed
process-local batch shards, and a jitted global reduction returns the same
answer in both processes."""

import os
import socket
import subprocess
import sys

import pytest

from ddti_tpu.parallel import MultihostSpec, spec_from

pytestmark = pytest.mark.slow  # full-depth tier: pytest tests/ -m "slow or not slow"


def test_spec_explicit_wins_over_env():
    s = spec_from("a:1", 4, 2,
                  env={"JAX_COORDINATOR_ADDRESS": "b:2",
                       "JAX_NUM_PROCESSES": "8", "JAX_PROCESS_ID": "7"})
    assert s == MultihostSpec("a:1", 4, 2)


def test_spec_from_env():
    s = spec_from(env={"JAX_COORDINATOR_ADDRESS": "h:9",
                       "JAX_NUM_PROCESSES": "2", "JAX_PROCESS_ID": "1"})
    assert s == MultihostSpec("h:9", 2, 1)


def test_spec_empty_is_autodetect():
    assert spec_from(env={}) == MultihostSpec(None, None, None)


def test_spec_partial_raises():
    with pytest.raises(ValueError, match="all three"):
        spec_from(coordinator="h:1", env={})
    with pytest.raises(ValueError, match="out of range"):
        spec_from("h:1", 2, 2, env={})
    with pytest.raises(ValueError, match=">= 1"):
        spec_from("h:1", 0, 0, env={})


_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from ddti_tpu.parallel import initialize_multihost, make_mesh, \
    process_local_batch, spec_from

initialize_multihost(spec_from())  # all via env
assert jax.process_count() == 2, jax.process_count()

import numpy as np
mesh = make_mesh({"data": 2})  # global mesh: one CPU device per process
rank = jax.process_index()
local = np.full((4, 8), float(rank + 1), np.float32)  # rows 0..3 or 4..7
batch = process_local_batch(local, mesh)
assert batch.shape == (8, 8), batch.shape

total = jax.jit(lambda x: x.sum())(batch)
# global sum = 4*8*1 + 4*8*2 = 96 in BOTH processes
print(f"RANK{rank} SUM {float(total)}", flush=True)
"""


def test_two_process_dcn_reduction(tmp_path):
    if sys.platform != "linux":
        pytest.skip("linux only")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # one CPU device per process
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(rank),
                   PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"RANK{rank} SUM 96.0" in out, out


_TRAINER_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from ddti_tpu.parallel import initialize_multihost, make_mesh, spec_from

initialize_multihost(spec_from())
assert jax.process_count() == 2

from ddti_tpu.core import Config, create_logger
from ddti_tpu.data import DeviceDataSource, generate_ddti_like
from ddti_tpu.models import create_model
from ddti_tpu.train import Trainer

mesh = make_mesh({"data": 2})
cfg = Config(epochs=1, batch_size=8, image_size=32, store_size=32,
             lr=1e-3, model_type="UNet",
             base_dir=os.environ["RUN_DIR"])
cfg.make_dirs()
logger = create_logger(os.path.join(cfg.log_dir, "log.log"))
# val split of 6 with batch 8: the single val batch carries 2
# wraparound-padded duplicates, which multi-host validate() must weight
# out on device (QUIRKS #22)
srcs = tuple(DeviceDataSource(*generate_ddti_like(n, (32, 32), s))
             for n, s in ((16, 0), (6, 1), (8, 2)))
model = create_model("UNet", base_filters=8, depth=3)
tr = Trainer(cfg, srcs, logger, model, mesh=mesh)
assert tr._multihost
tr.train_one_epoch(0)
_, iou = tr.validate(0)

# exact-IoU oracle: replicated final weights, host forward over the 6
# UNIQUE val images (bool-convention inter/union like the epoch IoU)
import numpy as np
w = jax.tree.map(lambda a: np.asarray(a.addressable_data(0)),
                 {"params": tr.state.params,
                  "batch_stats": tr.state.batch_stats})
logits = model.apply(w, np.asarray(srcs[1].images, np.float32) / 255.0,
                     train=False)
probs = 1 / (1 + np.exp(-np.asarray(logits, np.float32)))
gt = np.asarray(srcs[1].masks, np.float32) / 255.0 > 0
pred = probs > 0.5
expect = np.logical_and(pred, gt).sum() / max(
    np.logical_or(pred, gt).sum(), 1e-8)
assert abs(iou - expect) < 1e-5, (iou, expect)
print(f"RANK{jax.process_index()} IOU {iou:.6f}", flush=True)
"""


def test_two_process_trainer_epoch(tmp_path):
    """Full Trainer epoch over a 2-process DCN runtime: batches are fed as
    process-local shards (engine._shard_multihost) and both ranks converge
    to the identical validation IoU."""
    if sys.platform != "linux":
        pytest.skip("linux only")
    script = tmp_path / "worker.py"
    script.write_text(_TRAINER_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(rank),
                   RUN_DIR=str(tmp_path / f"run{rank}"),
                   PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""))
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=repo))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    ious = []
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if f"RANK{rank} IOU" in ln]
        assert line, out
        ious.append(float(line[0].split()[-1]))
    assert ious[0] == ious[1]

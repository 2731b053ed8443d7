"""A/B: per-leaf jax.device_get of a flagship train state vs a packed
single-buffer fetch.

Hypothesis: through the remote-dispatch tunnel each device->host transfer
pays a large fixed overhead, so fetching the ~1000 leaves of the flagship
(ResUNet bf=64 d=5, 130M params) train state leaf-by-leaf costs minutes
(observed: 3.5-20 min per best-epoch save at 512^2), while packing all
leaves into a handful of large flat buffers on device and fetching those
should run at wire bandwidth.

Usage: benchmarks/run_in_repo.sh benchmarks/ckpt_fetch_ab.py
"""

import time

import jax
import jax.numpy as jnp

from ddti_tpu.models import ResUNet
from ddti_tpu.train import create_train_state


def main():
    model = ResUNet(in_channels=1, out_channels=1, base_filters=64,
                    depth=5, dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, 256, 256, 1), 1e-4, steps_per_epoch=100)
    leaves = jax.tree.leaves({"params": state.params,
                              "batch_stats": state.batch_stats,
                              "opt_state": state.opt_state})
    nbytes = sum(x.size * x.dtype.itemsize for x in leaves)
    print(f"leaves={len(leaves)} total={nbytes/1e9:.2f} GB", flush=True)

    # warm: make sure everything is materialized
    jax.block_until_ready(leaves)

    # B: packed fetch — concatenate raveled leaves into one buffer per dtype
    @jax.jit
    def pack(ls):
        by_dtype = {}
        for i, x in enumerate(ls):
            by_dtype.setdefault(str(x.dtype), []).append(x.reshape(-1))
        return {k: jnp.concatenate(v) for k, v in by_dtype.items()}

    t0 = time.time()
    packed = pack(leaves)
    jax.block_until_ready(packed)
    t_pack = time.time() - t0
    t0 = time.time()
    host_packed = jax.device_get(packed)
    t_fetch_packed = time.time() - t0
    print(f"packed: pack={t_pack:.1f}s fetch={t_fetch_packed:.1f}s "
          f"({nbytes/1e6/max(t_fetch_packed,1e-9):.1f} MB/s)", flush=True)

    # A: plain tree device_get (the current save path)
    t0 = time.time()
    host = jax.device_get(leaves)
    t_tree = time.time() - t0
    print(f"tree device_get: {t_tree:.1f}s "
          f"({nbytes/1e6/max(t_tree,1e-9):.1f} MB/s)", flush=True)

    # A2: single large leaf alone, for the per-transfer overhead estimate
    big = max(leaves, key=lambda x: x.size)
    t0 = time.time()
    jax.device_get(big)
    t_big = time.time() - t0
    bb = big.size * big.dtype.itemsize
    print(f"largest leaf ({bb/1e6:.0f} MB): {t_big:.2f}s "
          f"({bb/1e6/max(t_big,1e-9):.1f} MB/s)", flush=True)

    # A3: 20 tiny leaves, per-transfer overhead directly
    tiny = [x for x in leaves if x.size < 1024][:20]
    t0 = time.time()
    jax.device_get(tiny)
    t_tiny = time.time() - t0
    print(f"{len(tiny)} tiny leaves: {t_tiny:.2f}s "
          f"({t_tiny/max(len(tiny),1)*1e3:.0f} ms/leaf)", flush=True)


if __name__ == "__main__":
    main()

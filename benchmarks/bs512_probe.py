"""Max-batch probe at 512x512 (the reference-native training resolution).

Round-3 state: bs16 = 54-57 img/s, bs32 OOMs one-shot AND with remat
(18.9 G vs 15.75 G HBM); the only bs32 route is --grad_accum 2 at 56.5
(benchmarks/ga_ab.py). This probe asks XLA's compile-time buffer
assignment (train/autobatch.py) whether any batch BETWEEN 16 and 32 fits
without remat — nothing is allocated — then the fitting candidates can be
measured with `python bench.py --measure train512` variants.

Usage: benchmarks/run_in_repo.sh benchmarks/bs512_probe.py [candidates...]
(the wrapper puts /root/repo on sys.path for the package import and the
axon sitecustomize)
"""

import sys

import jax.numpy as jnp

from ddti_tpu.core import Config
from ddti_tpu.core.compcache import enable_compilation_cache
from ddti_tpu.models import ResUNet
from ddti_tpu.train.autobatch import (
    device_budget_bytes,
    predicted_step_peak_bytes,
)


def main() -> int:
    enable_compilation_cache("auto")
    candidates = [int(a) for a in sys.argv[1:]] or [20, 24, 28]
    budget = device_budget_bytes()
    print(f"device budget: {budget / 2**30:.2f} GiB", flush=True)
    for remat in (False, True):
        for b in candidates:
            cfg = Config(batch_size=b, image_size=512, store_size=512,
                         lr=1e-5, model_type="ResUNet", use_mixup=False,
                         compute_unused_losses=False)
            model = ResUNet(in_channels=1, out_channels=1, base_filters=64,
                            depth=5, remat=remat, dtype=jnp.bfloat16)
            try:
                peak = predicted_step_peak_bytes(cfg, model, b)
            except Exception as e:
                print(f"bs{b} remat={remat}: probe failed {e!r}", flush=True)
                continue
            print(f"bs{b} remat={remat}: peak {peak / 2**30:.2f} GiB "
                  f"fits={peak <= budget}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

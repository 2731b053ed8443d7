"""Hardware probe: surface_metrics_batch cost at test() shapes.

Run: benchmarks/run_in_repo.sh benchmarks/surface_probe.py [batch size]
"""

import sys
import time

import jax
import numpy as np

from ddti_tpu.eval.surface import surface_metrics_batch


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[:size, :size]
    preds = np.stack([
        ((yy - rng.randint(size)) ** 2 + (xx - rng.randint(size)) ** 2
         <= rng.randint(10, size // 3) ** 2) for _ in range(batch)
    ]).astype(np.uint8)[..., None]
    gts = np.stack([
        ((yy - rng.randint(size)) ** 2 + (xx - rng.randint(size)) ** 2
         <= rng.randint(10, size // 3) ** 2) for _ in range(batch)
    ]).astype(np.float32)[..., None]
    p = jax.device_put(preds)
    g = jax.device_put(gts)
    t0 = time.perf_counter()
    out = surface_metrics_batch(p, g)
    float(out["hd95"][0])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = surface_metrics_batch(p, g)
    float(np.asarray(out["hd95"]).sum())
    per = (time.perf_counter() - t0) / n
    print(f"backend={jax.default_backend()} batch={batch} size={size} "
          f"compile={compile_s:.1f}s run={per * 1e3:.1f}ms "
          f"({per / batch * 1e3:.2f} ms/img) "
          f"valid={int(np.asarray(out['valid']).sum())}")


if __name__ == "__main__":
    main()

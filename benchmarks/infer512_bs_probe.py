#!/usr/bin/env python3
"""Batch sweep for the 512^2 inference leg on the real TPU.

Inference carries no optimizer moments or gradients, so its HBM ceiling is
far above training's: bs16 -> bs32 at 512^2 already bought +26%
(181 -> 227 img/s). This probes whether bs64 (the same activation pixel
count as a hypothetical 256^2 bs256 eval program) fits the 15.75 GiB chip
and what it yields, to decide the bench leg's batch.

One variant per process (fragmented-heap rule, CLAUDE.md):
  benchmarks/run_in_repo.sh benchmarks/infer512_bs_probe.py 32
  benchmarks/run_in_repo.sh benchmarks/infer512_bs_probe.py 64
"""

import sys
import time


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from ddti_tpu.core.compcache import enable_compilation_cache
    enable_compilation_cache("auto")

    import bench

    t0 = time.perf_counter()
    ips = bench.measure_infer(batch, 512, steps=steps)
    print(f"infer512 bs{batch}: {ips:.1f} img/s "
          f"(wall {time.perf_counter() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

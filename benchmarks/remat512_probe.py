#!/usr/bin/env python3
"""512^2 bs32 one-shot feasibility probe: compile-time peak HBM of the
flagship train step under no / selective / full remat (r5, VERDICT item 5).

Round-2 findings (exact-warp era): bs16 13.80 GiB fits; bs32 compile-
refused one-shot AND with full remat (the estimated 18.9 GiB peak was
dominated by the warp/BN-stats portion, not conv activations). Since then
the default augmentation became the Paeth fast warp (no gather buffers),
so the bs32 picture must be re-measured; per-level remat was never tried.

Usage: benchmarks/run_in_repo.sh benchmarks/remat512_probe.py
Prints one line per config: predicted peak GiB or "compile refused".
Compile-only (abstract operands): nothing is allocated on the chip, and
every fitting program lands in the persistent compile cache for the
follow-up throughput measurement.
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax.numpy as jnp

    from ddti_tpu.core import Config
    from ddti_tpu.core.compcache import enable_compilation_cache
    from ddti_tpu.models import ResUNet
    from ddti_tpu.train.autobatch import (
        device_budget_bytes,
        predicted_step_peak_bytes,
    )

    enable_compilation_cache("auto")
    budget = device_budget_bytes()
    print(f"device budget: {budget / 2**30:.2f} GiB", flush=True)

    cfg = Config(batch_size=32, image_size=512, store_size=512, lr=1e-5,
                 model_type="ResUNet", use_mixup=False,
                 compute_unused_losses=False)

    for name, remat in [("none", False), ("levels(0,)", (0,)),
                        ("levels(0,1)", (0, 1)), ("full", True)]:
        model = ResUNet(in_channels=1, out_channels=1, base_filters=64,
                        depth=5, remat=remat, dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        try:
            peak = predicted_step_peak_bytes(cfg, model, 32)
            fit = "FITS" if peak <= budget else "over"
            print(f"remat={name:12s} peak {peak / 2**30:6.2f} GiB "
                  f"({fit}; compile {time.perf_counter() - t0:.0f}s)",
                  flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"remat={name:12s} compile refused (over budget) after "
                  f"{time.perf_counter() - t0:.0f}s: {msg}", flush=True)


if __name__ == "__main__":
    main()

"""Generate the sweep config matrix (the analogue of the reference's
70-entry config/config.yaml: 10 entries per model type sweeping
base_filters x depth). Regenerate with:  python configs/gen_matrix.py
"""

from __future__ import annotations

import os

import yaml

MODELS = ["UNet", "ResUNet", "ASPPUNet", "AttentionUNet", "TransUNet",
          "VNet2D", "ImprovedVNet"]

# (base_filters, depth, out_channels) — 10 per model
SWEEP = [
    (16, 3, 1), (16, 5, 1), (24, 4, 1), (32, 3, 1), (32, 5, 2),
    (32, 4, 1), (48, 4, 1), (48, 5, 1), (64, 4, 1), (64, 5, 1),
]


def build_matrix() -> list[dict]:
    docs = []
    for m in MODELS:
        for bf, depth, out_ch in SWEEP:
            docs.append({
                "model": {
                    "model_type": m,
                    "kwargs": {
                        "in_channels": 1,
                        "out_channels": out_ch,
                        "base_filters": bf,
                        "depth": depth,
                    },
                }
            })
    return docs


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "config.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(build_matrix(), f, sort_keys=False)
    print(f"wrote {path} ({len(build_matrix())} entries)")


if __name__ == "__main__":
    main()

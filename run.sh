#!/usr/bin/env bash
# Config-matrix sweep launcher (the reference run.sh equivalent): splits the
# matrix and runs every generated config with max 3 concurrent jobs and a
# >=1 s launch stagger (handled by the Python sweep runner).
set -euo pipefail

CONFIG_DIR="${CONFIG_DIR:-configs/sweep}"

python configs/gen_matrix.py
mkdir -p "$CONFIG_DIR"
python -m ddti_tpu.cli.split_config configs/config.yaml "$CONFIG_DIR"
python -m ddti_tpu.cli.sweep --config_dir "$CONFIG_DIR" --max_jobs 3 --min_gap 1 \
    --extra "--mode both --synthetic --epochs 2 --image_size 256 --store_size 256"

#!/usr/bin/env bash
# Ablation runner (the reference test.sh equivalent): a fixed command list
# executed with a concurrency cap and launch stagger.
set -euo pipefail

CMDS="$(mktemp)"
cat > "$CMDS" <<'EOF'
python -m ddti_tpu.cli.main --model_type=ResUNet --mode both --synthetic --epochs 2 --image_size 256 --store_size 256
python -m ddti_tpu.cli.main --use_speckle --model_type=ResUNet --mode both --synthetic --epochs 2 --image_size 256 --store_size 256
python -m ddti_tpu.cli.main --use_tgc --model_type=ResUNet --mode both --synthetic --epochs 2 --image_size 256 --store_size 256
python -m ddti_tpu.cli.main --use_clahe --model_type=ResUNet --mode both --synthetic --epochs 2 --image_size 256 --store_size 256
python -m ddti_tpu.cli.main --use_mixup --model_type=ResUNet --mode both --synthetic --epochs 2 --image_size 256 --store_size 256
python -m ddti_tpu.cli.main --use_elastic --model_type=ResUNet --mode both --synthetic --epochs 2 --image_size 256 --store_size 256
EOF

python -m ddti_tpu.cli.sweep --commands_file "$CMDS" --max_jobs 3 --min_gap 2
rm -f "$CMDS"
echo "All jobs finished."

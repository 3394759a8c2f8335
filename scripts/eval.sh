#!/usr/bin/env bash
# nuScenes evaluation-protocol metrics (reference scripts/eval.sh): evaluates
# every protocol scene's final checkpoint on the test and full splits.
#
# Usage: DATA_ROOT=... [OUTPUT_ROOT=./work_dirs] ./scripts/eval.sh [scene...]
set -euo pipefail

output_root=${OUTPUT_ROOT:-./work_dirs}
scenes=(${@:-152 164 171 200 209 359 529 916})

for scene in "${scenes[@]}"; do
    run_dir="$output_root/nuscenes_protocol/$scene"
    ckpt=$(ls -d "$run_dir"/checkpoints/checkpoint_* | sort -V | tail -1)
    python -m bilateral_driving_tpu.tools.eval \
        --log_dir "$run_dir" --checkpoint "$ckpt" --compute_geo
done

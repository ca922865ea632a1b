#!/usr/bin/env bash
# Per-video pred-vs-GT score overlays for Mr.HiSum
# (ref scripts/visualize/visualize_hisum.sh -> test/visualize.py dataset=hisum).
set -euo pipefail
OUT=${OUT:-outputs/hisum}

python -m aha_tpu.cli visualize \
  --func pred_vs_gt \
  --pred_file "${PRED_FILE:-$OUT/pred.json}" \
  --gold_file "${HISUM_H5:-datasets/yt8m/annotations/mr_hisum.h5}" \
  --params_file "${PARAMS_FILE:-$OUT/grid_search_params.json}" \
  --params_key hisum \
  --output "${FIG_DIR:-$OUT/figures}" \
  --max_show "${MAX_SHOW:-5}" "$@"

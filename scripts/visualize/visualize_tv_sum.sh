#!/usr/bin/env bash
# Per-video pred-vs-GT score overlays for TVSum
# (ref scripts/visualize/visualize_tv_sum.sh -> test/visualize.py dataset=tvsum).
set -euo pipefail
OUT=${OUT:-outputs/tvsum}

python -m aha_tpu.cli visualize \
  --func pred_vs_gt \
  --pred_file "${PRED_FILE:-$OUT/pred.json}" \
  --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
  --params_file "${PARAMS_FILE:-$OUT/grid_search_params.json}" \
  --params_key tvsum \
  --output "${FIG_DIR:-$OUT/figures}" \
  --max_show "${MAX_SHOW:-5}" "$@"

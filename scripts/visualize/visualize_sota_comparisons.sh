#!/usr/bin/env bash
# SOTA comparison panels (ref scripts/visualize/visualize_sota_comparisons.sh
# -> test/visualize.py dataset=hisum_visualize_sota_scores): compute our
# HiSum metrics from a prediction file and plot them against the published
# baselines; optionally also render the TVSum SOTA panel from an evaluate
# output (set TVSUM_METRICS).
set -euo pipefail
OUT=${OUT:-outputs/hisum}

python -m aha_tpu.cli visualize \
  --func hisum_sota \
  --pred_file "${PRED_FILE:-$OUT/pred.json}" \
  --gold_file "${HISUM_H5:-datasets/yt8m/annotations/mr_hisum.h5}" \
  --params_file "${PARAMS_FILE:-$OUT/grid_search_params.json}" \
  --output "${FIG_DIR:-$OUT/figures}" "$@"

if [[ -n "${TVSUM_METRICS:-}" ]]; then
  python -m aha_tpu.cli visualize \
    --func tvsum_sota \
    --metrics_file "$TVSUM_METRICS" \
    --output "${FIG_DIR:-$OUT/figures}"
fi

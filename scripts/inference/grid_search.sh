#!/usr/bin/env bash
# Re-run grid-search calibration over existing prediction files
# (ref scripts/inference/grid_search.sh). Each block expects the matching
# inference script to have produced outputs/<dataset>/pred.json already;
# set e.g. RUN=tvsum to calibrate a single dataset.
set -euo pipefail
RUN=${RUN:-all}

maybe() { [ "$RUN" = all ] || [ "$RUN" = "$1" ]; }

if maybe tvsum; then
  python -m aha_tpu.cli grid-search --test_dataset tvsum \
    --pred_file "${TVSUM_PRED:-outputs/tvsum/pred.json}" \
    --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
    --save_path outputs/grid_search_params.json
fi

if maybe tvsum_degraded; then
  python -m aha_tpu.cli grid-search --test_dataset tvsum_degraded \
    --pred_file "${TVSUM_DEGRADED_PRED:-outputs/tvsum_degraded/pred.json}" \
    --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
    --save_path outputs/grid_search_params.json
fi

if maybe hisum; then
  python -m aha_tpu.cli grid-search --test_dataset hisum \
    --pred_file "${HISUM_PRED:-outputs/hisum/pred.json}" \
    --gold_file "${HISUM_H5:-datasets/hisum/mr_hisum.h5}" \
    --save_path outputs/grid_search_params.json
fi

if maybe charades; then
  python -m aha_tpu.cli grid-search --test_dataset charades \
    --pred_file "${CHARADES_PRED:-outputs/charades/pred.json}" \
    --gold_file "${CHARADES_ANNO:-datasets/charades/annotations/test-random_prompt.json}" \
    --save_path outputs/grid_search_params.json
fi

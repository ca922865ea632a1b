#!/usr/bin/env bash
# ARL-SCOUT live robot-stream demo (ref scripts/inference/arl_scout.sh):
# score-sum trigger on the informative head, assistant turns rolled back
# after each response, ticks scored against the hand-labeled GT table.
set -euo pipefail
OUT=${OUT:-outputs/arl_scout}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset arl_scout \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --input_dir "${ARL_VIDEO:-datasets/arl_scout/scout_full_vid.mp4}" \
  --output_fname "$OUT/pred.json" \
  --stream_end_score_sum_threshold "${THRES_SUM:-2}" \
  --remove_assistant_turns \
  --score_heads informative_score \
  --tick_table configs/tick_tables/demo_ticks.json \
  --frame_fps 1 "$@"

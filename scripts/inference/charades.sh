#!/usr/bin/env bash
# Charades-STA grounding pipeline (ref scripts/inference/charades.sh):
# streaming scores at 2 fps, <=400 frames, no generation.
set -euo pipefail
OUT=${OUT:-outputs/charades}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset charades \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --grounding_mode \
  --test_fname "${CHARADES_TEST:-datasets/charades/test.json}" \
  --input_dir "${CHARADES_VIDEOS:-datasets/charades/videos}" \
  --output_fname "$OUT/pred.jsonl" \
  --frame_fps 2 --max_num_frames 400 "$@"

python -m aha_tpu.cli grid-search \
  --test_dataset charades \
  --pred_file "$OUT/pred.jsonl" \
  --gold_file "${CHARADES_GOLD:-datasets/charades/test.json}" \
  --save_path "$OUT/grid_search_params.json"

python -m aha_tpu.cli evaluate \
  --func grounding \
  --pred_file "$OUT/pred.jsonl" \
  --gold_file "${CHARADES_GOLD:-datasets/charades/test.json}" \
  --params_file "$OUT/grid_search_params.json" \
  --output_file "$OUT/metrics.json"

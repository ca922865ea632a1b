#!/usr/bin/env bash
# TVSum with the truly-static KV cache, no sink slots
# (ref scripts/inference/tvsum_cache_static.sh, output_dir=outputs/tvsum_static).
set -euo pipefail
OUT=${OUT:-outputs/tvsum_static}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset tvsum \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --input_dir "${TVSUM_VIDEOS:-datasets/tvsum/videos}" \
  --caption_metadata_file "${TVSUM_INFO:-datasets/tvsum/data/ydata-tvsum50-info.tsv}" \
  --video_metadata_file "$OUT/videos_metadata.json" \
  --output_fname "$OUT/pred.json" \
  --kv_cache_policy static --kv_window "${KV_WINDOW:-2048}" \
  --frame_fps 1 "$@"

python -m aha_tpu.cli evaluate \
  --func tvsum \
  --pred_file "$OUT/pred.json" \
  --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
  --output_file "$OUT/metrics.json"

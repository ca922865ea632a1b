#!/usr/bin/env bash
# TVSum title-prompt ablation (ref scripts/inference/tvsum_prompt.sh,
# output_dir=outputs/tvsum_ambiguous): replace each video's title query
# with an ambiguous (or unrelated) one. ABLATION=unrelated for the other arm.
set -euo pipefail
ABLATION=${ABLATION:-ambiguous}
OUT=${OUT:-outputs/tvsum_${ABLATION}}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset tvsum \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --input_dir "${TVSUM_VIDEOS:-datasets/tvsum/videos}" \
  --caption_metadata_file "${TVSUM_INFO:-datasets/tvsum/data/ydata-tvsum50-info.tsv}" \
  --video_metadata_file "$OUT/videos_metadata.json" \
  --output_fname "$OUT/pred.json" \
  --title_ablation "$ABLATION" \
  ${TITLE_TABLE:+--title_table "$TITLE_TABLE"} \
  --frame_fps 1 "$@"

python -m aha_tpu.cli grid-search \
  --test_dataset tvsum \
  --pred_file "$OUT/pred.json" \
  --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
  --save_path "$OUT/grid_search_params.json"

python -m aha_tpu.cli evaluate \
  --func tvsum \
  --pred_file "$OUT/pred.json" \
  --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
  --params_file "$OUT/grid_search_params.json" \
  --output_file "$OUT/metrics.json"

#!/usr/bin/env bash
# TVSum degraded-quality ablation (ref scripts/inference/tvsum_degraded.sh):
# same 3-stage pipeline as tvsum.sh but with seeded quality-dropout
# segments injected at decode time (--test_dataset tvsum_degraded).
set -euo pipefail
OUT=${OUT:-outputs/tvsum_degraded}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset tvsum_degraded \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --input_dir "${TVSUM_VIDEOS:-datasets/tvsum/videos}" \
  --caption_metadata_file "${TVSUM_INFO:-datasets/tvsum/data/ydata-tvsum50-info.tsv}" \
  --video_metadata_file "$OUT/videos_metadata.json" \
  --output_fname "$OUT/pred.json" \
  --seed "${SEED:-42}" \
  --frame_fps 1 --max_num_frames 400 "$@"

python -m aha_tpu.cli grid-search \
  --test_dataset tvsum_degraded \
  --pred_file "$OUT/pred.json" \
  --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
  --save_path "$OUT/grid_search_params.json"

python -m aha_tpu.cli evaluate \
  --func tvsum \
  --params_key tvsum_degraded \
  --pred_file "$OUT/pred.json" \
  --gold_file "${TVSUM_ANNO:-datasets/tvsum/data/ydata-tvsum50-anno.tsv}" \
  --params_file "$OUT/grid_search_params.json" \
  --output_file "$OUT/metrics.json"

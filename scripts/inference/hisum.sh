#!/usr/bin/env bash
# Mr.HiSum pipeline (ref scripts/inference/hisum.sh).
set -euo pipefail
OUT=${OUT:-outputs/hisum}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset hisum \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --input_dir "${HISUM_VIDEOS:-datasets/hisum/videos}" \
  --anno_file "${HISUM_SPLIT:-datasets/hisum/splits.json}" \
  --hisum_h5_file "${HISUM_H5:-datasets/hisum/mr_hisum.h5}" \
  --caption_metadata_file "${HISUM_META:-datasets/hisum/metadata.csv}" \
  --video_metadata_file "$OUT/videos_metadata.json" \
  --output_fname "$OUT/pred.json" \
  --frame_fps 1 "$@"

python -m aha_tpu.cli grid-search \
  --test_dataset hisum \
  --pred_file "$OUT/pred.json" \
  --gold_file "${HISUM_H5:-datasets/hisum/mr_hisum.h5}" \
  --save_path "$OUT/grid_search_params.json"

python -m aha_tpu.cli evaluate \
  --func hisum \
  --pred_file "$OUT/pred.json" \
  --gold_file "${HISUM_H5:-datasets/hisum/mr_hisum.h5}" \
  --params_file "$OUT/grid_search_params.json" \
  --output_file "$OUT/metrics.json"

#!/usr/bin/env bash
# KV-cache ablation suite (ref scripts/inference/tvsum_cache*.sh):
# run TVSum scoring under each cache policy and compare metrics.
set -euo pipefail
BASE_OUT=${BASE_OUT:-outputs/tvsum_cache}

for POLICY in sink sliding static; do
  OUT="$BASE_OUT/$POLICY"
  mkdir -p "$OUT"
  python -m aha_tpu.cli infer \
    --test_dataset tvsum \
    --model_preset 7b --int8 \
    --llm_pretrained "${LLM_PRETRAINED:-}" \
    --input_dir "${TVSUM_VIDEOS:-datasets/tvsum/videos}" \
    --caption_metadata_file "${TVSUM_INFO:-datasets/tvsum/data/ydata-tvsum50-info.tsv}" \
    --video_metadata_file "$OUT/videos_metadata.json" \
    --output_fname "$OUT/pred.json" \
    --kv_cache_policy "$POLICY" --kv_window 2048 --num_sink_tokens 32 \
    --frame_fps 1 "$@"
done

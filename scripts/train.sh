#!/usr/bin/env bash
# Training entry (ref scripts/train.sh). One process per host; jax.distributed
# handles multi-host TPU pods — no torchrun/DeepSpeed launcher needed.
set -euo pipefail

python -m aha_tpu.cli train \
  --model_preset 7b \
  --llm_pretrained "${LLM_PRETRAINED:-checkpoints/llava-onevision-qwen2-7b-ov}" \
  --tokenizer_pretrained "${TOKENIZER_PRETRAINED:-checkpoints/llava-onevision-qwen2-7b-ov}" \
  --dataset_config configs/datasets/aha_mixture.json \
  --output_dir outputs/aha_train \
  --num_steps "${NUM_STEPS:-2000}" \
  --batch_size 1 \
  --grad_accum_steps 2 \
  --learning_rate 2e-5 \
  --mesh_data -1 --mesh_model 1 \
  "$@"

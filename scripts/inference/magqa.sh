#!/usr/bin/env bash
# MAGQA streaming QA pipeline (ref scripts/inference/magqa.sh):
# prob-threshold 0.5 trigger at 2 fps, then LLM-judge scoring.
set -euo pipefail
OUT=${OUT:-outputs/magqa}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset magqa \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --test_fname "${MAGQA_TEST:-datasets/magqa/test.json}" \
  --input_dir "${MAGQA_VIDEOS:-datasets/shot2story/videos}" \
  --output_fname "$OUT/pred.jsonl" \
  --frame_fps 2 --max_num_frames 400 \
  --stream_end_prob_threshold 0.5 \
  --score_heads relevance_score \
  --remove_assistant_turns "$@"

# stage 2: local LLM-judge score matrices + in-span aggregation
python - <<'PY'
import json, os
from aha_tpu.eval import llm_judge
out = os.environ.get("OUT", "outputs/magqa")
preds = [json.loads(l) for l in open(f"{out}/pred.jsonl")]
gold = json.load(open(os.environ.get("MAGQA_GOLD", "datasets/magqa/test.json")))
judge_ckpt = os.environ.get("JUDGE_CKPT")
if judge_ckpt:
    import jax.numpy as jnp
    from aha_tpu.config import qwen2_7b
    from aha_tpu.models.loader import load_params
    from aha_tpu.tokenization import build_stream_tokenizer
    cfg = qwen2_7b()
    params = load_params(judge_ckpt, cfg, dtype=jnp.bfloat16)
    tok = build_stream_tokenizer(judge_ckpt)
    judge = llm_judge.LocalJudge(params["llm"] if "llm" in params else params, cfg, tok)
    scored = llm_judge.magqa_score_matrices(preds, gold, judge)
    with open(f"{out}/judged.jsonl", "w") as f:
        for ex in scored:
            f.write(json.dumps(ex) + "\n")
    print(json.dumps(llm_judge.analyze_magqa(scored), indent=2))
else:
    print("set JUDGE_CKPT to a converted judge checkpoint, or use "
          "llm_judge.to_openai_batch_input for the remote-judge path")
PY

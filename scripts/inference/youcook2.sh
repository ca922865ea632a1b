#!/usr/bin/env bash
# YouCook2 dense-captioning pipeline (ref scripts/inference/youcook2.sh):
# streaming generation at 0.5 fps, <=200 frames, score-sum trigger 5.789.
set -euo pipefail
OUT=${OUT:-outputs/youcook2}
mkdir -p "$OUT"

python -m aha_tpu.cli infer \
  --test_dataset youcook2 \
  --model_preset 7b --int8 \
  --llm_pretrained "${LLM_PRETRAINED:-}" \
  --test_fname "${YOUCOOK2_TEST:-datasets/youcook2/test.json}" \
  --input_dir "${YOUCOOK2_VIDEOS:-datasets/youcook2/videos}" \
  --output_fname "$OUT/pred.jsonl" \
  --frame_fps 0.5 --max_num_frames 200 \
  --stream_end_score_sum_threshold 5.789 \
  --score_heads informative_score \
  --remove_assistant_turns "$@"

# stage 2: SODA / CIDEr / METEOR via aha_tpu.eval.soda.eval_with_files
python - <<'PY'
import json, os
from aha_tpu.eval.soda import eval_with_files
out = os.environ.get("OUT", "outputs/youcook2")
preds = [json.loads(l) for l in open(f"{out}/pred.jsonl")]
pred_out = {}
for p in preds:
    caps, prev, start, end = [], None, None, None
    for turn in p["model_response_list"]:
        if turn["role"] == "user":
            continue
        if turn["content"] != prev:
            if start is not None:
                caps.append({"timestamp": [start, end], "caption": prev})
            prev, start, end = turn["content"], end, turn["time"]
        else:
            end = turn["time"]
    if start is not None:
        caps.append({"timestamp": [start, end], "caption": prev})
    pred_out[str(p["question_id"])] = caps
json.dump(pred_out, open(f"{out}/pred_dvc.json", "w"))
metrics = eval_with_files(f"{out}/pred_dvc.json",
                          os.environ.get("YOUCOOK2_GOLD", "datasets/youcook2/val.json"))
json.dump(metrics, open(f"{out}/metrics.json", "w"), indent=2)
print(json.dumps(metrics, indent=2))
print("NOTE:", metrics.get("METEOR_note", ""))
print("      (jar backend: put meteor-1.5.jar at $AHA_METEOR_JAR with a"
      " JRE on PATH — jar-identical METEOR; otherwise METEOR-lite, close"
      " to but NOT number-identical with the paper's Java METEOR. CIDEr"
      " and SODA storytelling F1 are exact re-derivations either way.)")
PY

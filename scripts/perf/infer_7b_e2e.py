"""On-chip 7B END-TO-END PRODUCT INFERENCE rehearsal (VERDICT r4 next #1):
the inference twin of round 4's train_7b_e2e.py. Drives the REAL product
entry points as subprocesses on the chip at deployment scale — not the
engine layer bench.py talks to:

  stage 1  `aha infer --test_dataset tvsum --model_preset 7b
           --synthetic_weights --int8` over on-disk synthetic videos:
           native/libav (or cv2) decode -> letterbox -> vision encode ->
           fused scan scoring -> prediction JSON with debug_data.
  stage 2  `aha grid-search` over the stage-1 predictions (host/CPU).
  stage 3  `aha evaluate --func tvsum` -> metrics JSON (host/CPU).
  stage 4  `aha highlight` -> knapsack reel mp4 from the stage-1 scores.
  stage 5  `aha serve` (continuous batching) through the JSONL feeder
           protocol with ragged streams + per-request threshold overrides,
           7B int8, generation on.

Weights are `--synthetic_weights` (seeded leaf-wise int8 materialization —
the same leaves as bench.py), so scores/answers are meaningless but every
byte of product machinery, memory behavior, and throughput is real.
Ref workload: test/inference.py:590-952, scripts/inference/tvsum.sh
(the 3-stage pipeline), test/inference.py:857-908 (serving).

Run ON THE CHIP (stages serialize; one TPU process at a time):
    python scripts/perf/infer_7b_e2e.py [--tiny] [--videos N] [--frames N]
Prints one JSON line per stage and a summary; results recorded in
BASELINE.md (round-5 inference-e2e section).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = str(pathlib.Path(__file__).resolve().parents[2])
sys.path.insert(0, REPO)


def write_fake_video(path, n_frames, fps, size=(320, 240)):
    import cv2

    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                          fps, size)
    rng = np.random.default_rng(hash(str(path)) % 2**31)
    for i in range(n_frames):
        frame = np.full((size[1], size[0], 3), (i * 7) % 255, np.uint8)
        frame[: 40, : 40] = rng.integers(0, 255, (40, 40, 3))
        out.write(frame)
    out.release()


def run_stage(name, argv, timeout=3600):
    t0 = time.perf_counter()
    r = subprocess.run(argv, cwd=REPO, capture_output=True, text=True,
                       timeout=timeout)
    dt = time.perf_counter() - t0
    ok = r.returncode == 0
    row = {"stage": name, "ok": ok, "wall_s": round(dt, 1)}
    if not ok:
        row["stderr_tail"] = r.stderr[-2000:]
    print(json.dumps(row), flush=True)
    if not ok:
        raise SystemExit(f"stage {name} failed (see stderr_tail above)")
    return dt, r


def main():
    tiny = "--tiny" in sys.argv
    n_videos = (int(sys.argv[sys.argv.index("--videos") + 1])
                if "--videos" in sys.argv else 2)
    n_frames = (int(sys.argv[sys.argv.index("--frames") + 1])
                if "--frames" in sys.argv else 64)
    src_fps = 8.0
    preset_flags = (["--model_preset", "tiny"] if tiny else
                    ["--model_preset", "7b", "--synthetic_weights", "--int8"])
    if tiny:
        # CPU smoke of the harness: force the backend IN CODE (the
        # sitecustomize pins the TPU tunnel before env vars apply)
        code = ("import sys, jax;"
                " jax.config.update('jax_platforms', 'cpu');"
                " from aha_tpu import cli;"
                " getattr(cli, 'cmd_' + sys.argv[1].replace('-', '_'))"
                "(sys.argv[2:])")
        py = [sys.executable, "-c", code]
    else:
        py = [sys.executable, "-m", "aha_tpu.cli"]
    env_note = {"preset": "tiny" if tiny else "7b-int8-synthetic",
                "videos": n_videos, "frames_per_video": n_frames}
    print(json.dumps({"stage": "setup", **env_note}), flush=True)

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="aha_infer_e2e_"))
    vids = [f"vid{chr(65 + i)}" for i in range(n_videos)]
    for v in vids:
        write_fake_video(tmp / f"{v}.mp4", n_frames, src_fps)
    caption = tmp / "captions.tsv"
    caption.write_text("category\tid\ttitle\turl\tlength\n" + "".join(
        f"GA\t{v}\ta synthetic clip {v}\turl\t0:{n_frames // int(src_fps):02d}\n"
        for v in vids))
    pred = tmp / "pred.json"

    # stage 1: aha infer (tvsum scoring pipeline, native decode). Scoring
    # fps = source fps so every decoded frame is scored (--score_fps to
    # override): the first run is compile-dominated (fresh CLI programs);
    # re-run with the warm compile cache for the steady-state number.
    score_fps = (sys.argv[sys.argv.index("--score_fps") + 1]
                 if "--score_fps" in sys.argv else str(src_fps))
    dt1, _ = run_stage("infer_tvsum", [
        *py, "infer", "--test_dataset", "tvsum", *preset_flags,
        "--input_dir", str(tmp), "--caption_metadata_file", str(caption),
        "--video_metadata_file", str(tmp / "meta.json"),
        "--output_fname", str(pred), "--frame_fps", score_fps,
    ])
    results = json.loads(pred.read_text())
    frames_scored = sum(len(r["debug_data"]) for r in results)
    assert len(results) == n_videos, (len(results), n_videos)
    assert all(np.isfinite(d["relevance_score"])
               for r in results for d in r["debug_data"])
    print(json.dumps({"stage": "infer_tvsum.check", "videos": len(results),
                      "frames_scored": frames_scored,
                      "fps_incl_decode_and_compile":
                      round(frames_scored / dt1, 2)}), flush=True)

    # stage 2: grid search (host)
    anno = tmp / "anno.tsv"
    rng = np.random.default_rng(0)
    rows = []
    for v in vids:
        for _ in range(3):
            rows.append(f"{v}\tGA\t" + ",".join(
                str(rng.integers(1, 6)) for _ in range(n_frames)))
    anno.write_text("\n".join(rows) + "\n")
    params_json = tmp / "grid_search_params.json"
    run_stage("grid_search", [
        *py, "grid-search", "--test_dataset", "tvsum",
        "--pred_file", str(pred), "--gold_file", str(anno),
        "--save_path", str(params_json), "--seed", "0",
    ])

    # stage 3: evaluate (host)
    metrics_json = tmp / "metrics.json"
    run_stage("evaluate", [
        *py, "evaluate", "--func", "tvsum", "--pred_file", str(pred),
        "--gold_file", str(anno), "--params_file", str(params_json),
        "--output_file", str(metrics_json),
    ])
    metrics = json.loads(metrics_json.read_text())
    assert "overall" in metrics and "mAP50" in metrics["overall"]

    # stage 4: highlight reel (host decode + knapsack + writer)
    reel = tmp / "reel.mp4"
    run_stage("highlight", [
        *py, "highlight", "--pred_file", str(pred),
        "--video_uuid", vids[0], "--video_path", str(tmp / f"{vids[0]}.mp4"),
        "--output_filepath", str(reel), "--max_duration", "4",
        "--params_file", str(params_json), "--source_fps", str(src_fps),
    ])
    assert reel.exists() and reel.stat().st_size > 0

    # stage 5: aha serve through the JSONL feeder, ragged + overrides
    reqs = tmp / "requests.jsonl"
    lines = []
    for j in range(2 * max(2, n_videos)):
        req = {"key": f"s{j}", "video": str(tmp / f"{vids[j % n_videos]}.mp4"),
               "conversation": [{"role": "user", "time": 0.0,
                                 "content": f"what happens in stream {j}?"}]}
        if j % 3 == 0:
            req["stream_end_prob_threshold"] = 0.55   # this stream answers
        lines.append(json.dumps(req))
    reqs.write_text("\n".join(lines) + "\n")
    out_jsonl = tmp / "serve_out.jsonl"
    dt5, r5 = run_stage("serve", [
        *py, "serve", *preset_flags, "--batch", "4",
        "--max_frames", str(n_frames), "--frame_fps", "4.0",
        "--input", str(reqs), "--output", str(out_jsonl),
        "--stream_end_prob_threshold", "1e9",   # server default: score-only
        "--max_new_tokens", "16", "--emit_scores",
    ])
    served = [json.loads(l) for l in out_jsonl.read_text().splitlines()]
    assert len(served) == 2 * max(2, n_videos), len(served)
    n_answers = sum(
        len([t for t in s.get("responses", []) if t.get("role") == "assistant"])
        for s in served)
    frames_served = sum(len(s.get("debug_data") or []) for s in served)
    assert n_answers > 0, "the 0.55-override streams must answer"
    print(json.dumps({
        "stage": "serve.check", "streams": len(served),
        "answers": n_answers, "frames_served": frames_served,
        "agg_fps_incl_decode_and_compile": round(frames_served / dt5, 2),
    }), flush=True)

    print(json.dumps({"stage": "DONE", "workdir": str(tmp), **env_note}),
          flush=True)


if __name__ == "__main__":
    main()

"""End-to-end driver tests: the TVSum pipeline (decode -> score -> JSON ->
grid search -> evaluate) on synthetic videos with the tiny model — the
"minimum end-to-end slice" milestone of SURVEY §7."""

import json
import os

import numpy as np
import pytest

from aha_tpu.config import InferConfig, aha_tiny
from aha_tpu.drivers import benchmarks
from aha_tpu.drivers.eval_dataset import StreamingVideoQADataset
from aha_tpu.models import aha
from aha_tpu.streaming.session import build_session

cv2 = pytest.importorskip("cv2")


def write_fake_video(path, n_frames=24, fps=8.0, size=(64, 48)):
    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    rng = np.random.default_rng(hash(str(path)) % 2**31)
    for i in range(n_frames):
        frame = np.full((size[1], size[0], 3), (i * 10) % 255, np.uint8)
        frame[:10, :10] = rng.integers(0, 255, (10, 10, 3))
        out.write(frame)
    out.release()


@pytest.fixture(scope="module")
def session():
    cfg = aha_tiny(vocab_size=256)
    params, cfg, tokenizer = aha.build_model_and_tokenizer(cfg, seed=0)
    infer_cfg = InferConfig(
        frame_fps=1.0, frame_resolution=cfg.frame_resolution,
        grounding_mode=True, kv_cache_policy="sink", kv_window=128,
        num_sink_tokens=8,
    )
    return build_session(params, cfg, tokenizer, infer_cfg)


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("videos")
    for vid in ("vidA", "vidB"):
        write_fake_video(d / f"{vid}.mp4")
    return d


def test_tvsum_pipeline(session, video_dir, tmp_path):
    caption_file = tmp_path / "captions.tsv"
    caption_file.write_text(
        "category\tid\ttitle\turl\tlength\n"
        "GA\tvidA\ta cooking show\turl\t0:24\n"
        "GA\tvidB\ta dog video\turl\t0:24\n"
    )
    out = tmp_path / "pred.json"
    results = benchmarks.run_tvsum(
        session,
        input_dir=str(video_dir),
        caption_file=str(caption_file),
        video_metadata_file=str(tmp_path / "meta.json"),
        output_fname=str(out),
        frame_fps=1.0,
        seed=0,
    )
    assert len(results) == 2
    for r in results:
        assert set(r) == {"video_uuid", "model_response_list", "video_duration",
                          "true_frames_list", "debug_data"}
        assert len(r["debug_data"]) == len(r["true_frames_list"]) == 3  # 24f/8fps @1fps
        for d in r["debug_data"]:
            assert set(d) == {"time", "informative_score", "relevance_score",
                              "uncertainty_score"}
    saved = json.loads(out.read_text())
    assert saved == results

    # stage 2: grid search over these predictions
    anno_file = tmp_path / "anno.tsv"
    rows = []
    rng = np.random.default_rng(0)
    for vid in ("vidA", "vidB"):
        n_src = 24
        for _ in range(3):  # 3 annotators
            rows.append(f"{vid}\tGA\t" + ",".join(str(rng.integers(1, 6)) for _ in range(n_src)))
    anno_file.write_text("\n".join(rows) + "\n")

    from aha_tpu.eval.grid_search import run_grid_search
    from aha_tpu.eval.tvsum import load_annotations

    annos = load_annotations(str(anno_file))
    params_path = tmp_path / "grid_search_params.json"
    small = {k: np.linspace(*r, 2) for k, r in
             {"alpha": (0, 1.5), "beta": (0, 1.5), "epsilon": (-5, 5),
              "uncertainty_threshold": (0.04, 0.15)}.items()}
    best = run_grid_search("tvsum", results, ground_truths=annos, grid=small,
                           save_path=str(params_path), seed=0)
    assert "alpha" in best and params_path.exists()

    # stage 3: evaluate via the CLI function
    from aha_tpu.cli import cmd_evaluate

    out_file = tmp_path / "metrics.json"
    cmd_evaluate([
        "--func", "tvsum", "--pred_file", str(out), "--gold_file", str(anno_file),
        "--params_file", str(params_path), "--output_file", str(out_file),
    ])
    metrics = json.loads(out_file.read_text())
    assert "overall" in metrics and "mAP50" in metrics["overall"]
    assert "GA" in metrics["per_category"]


def test_hisum_driver(session, video_dir, tmp_path):
    """run_hisum end-to-end on synthetic assets (ref test/inference.py:714-794):
    anno keys -> metadata CSV -> decode -> scores, with the ref JSON shape."""
    import h5py

    h5_path = tmp_path / "gt.h5"
    with h5py.File(h5_path, "w") as hdf:
        hdf.create_group("video_1").create_dataset("gtscore", data=np.zeros(4))
    anno = tmp_path / "anno.json"
    anno.write_text(json.dumps({"test_keys": ["video_1", "video_missing"]}))
    meta_csv = tmp_path / "meta.csv"
    meta_csv.write_text(
        "video_id,title,labels,youtube_id,yt8m_file\n"
        "video_1,a cooking show,\"['Food']\",vidA,f1\n"
        "video_missing,gone,\"[]\",nope,f2\n")
    out = tmp_path / "hisum_pred.json"
    results = benchmarks.run_hisum(
        session,
        input_dir=str(video_dir),
        anno_file=str(anno),
        h5_file=str(h5_path),
        hisum_metadata=str(meta_csv),
        video_metadata_file=str(tmp_path / "vmeta.json"),
        output_fname=str(out),
        frame_fps=1.0,
        seed=0,
    )
    assert len(results) == 1  # missing video skipped
    r = results[0]
    assert r["h5_identifier"] == "video_1" and r["video_uuid"] == "vidA"
    assert r["categories"] == ["Food"]
    assert len(r["debug_data"]) == len(r["true_frames_list"]) == 3
    assert json.loads(out.read_text()) == results


def test_streaming_qa_driver(session, video_dir, tmp_path):
    test_file = tmp_path / "test.json"
    test_file.write_text(json.dumps([
        {"question_id": "q1", "video": "vidA.mp4",
         "conversation": [{"role": "user", "content": "what?", "time": 0}]},
        {"question_id": "q2", "video": "missing.mp4",
         "conversation": [{"role": "user", "content": "what?", "time": 0}]},
    ]))
    out = tmp_path / "pred.jsonl"
    results = benchmarks.run_streaming_qa(
        session,
        test_fname=str(test_file),
        input_dir=str(video_dir),
        output_fname=str(out),
        frame_fps=1.0,
        max_num_frames=10,
        grounding_mode=True,
    )
    assert len(results) == 1  # missing video skipped
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert lines[0]["question_id"] == "q1"
    assert len(lines[0]["debug_data"]) == 3


def test_eval_dataset_auto_fps(video_dir):
    # auto fps: fit max_num_frames over the video
    import json as _json

    tf = video_dir / "t.json"
    tf.write_text(_json.dumps([
        {"question_id": "q", "video": "vidA.mp4",
         "conversation": [{"role": "user", "content": "hi"}]},
    ]))
    ds = StreamingVideoQADataset(str(tf), str(video_dir), output_fps="auto",
                                 max_num_frames=6, output_resolution=32)
    qid, frames, conv, fps, duration = ds[0]
    assert qid == "q"
    assert frames.shape[0] <= 6
    assert conv[0]["role"] == "system"
    assert fps == pytest.approx(6 / duration)


def test_tvsum_degraded_runs(session, video_dir, tmp_path):
    caption_file = tmp_path / "captions.tsv"
    caption_file.write_text("c\ti\tt\tu\tl\nGA\tvidA\tx\tu\t0:24\n")
    out = tmp_path / "pred_deg.json"
    results = benchmarks.run_tvsum(
        session,
        input_dir=str(video_dir),
        caption_file=str(caption_file),
        video_metadata_file=str(tmp_path / "meta2.json"),
        output_fname=str(out),
        frame_fps=1.0,
        degraded=True,
        seed=0,
    )
    assert len(results) == 1


def test_cli_demo_and_qvh_evaluate(video_dir, tmp_path):
    from aha_tpu.cli import cmd_demo, cmd_evaluate

    out_dir = tmp_path / "demo"
    cmd_demo([
        "--video", str(video_dir / "vidA.mp4"), "--query", "what happens?",
        "--output_dir", str(out_dir), "--frame_fps", "1.0",
        "--model_preset", "tiny", "--render_video",
    ])
    assert (out_dir / "live_scores.json").exists()
    assert (out_dir / "demo_stitched.mp4").exists()

    # qvh evaluate on synthetic traces
    preds = [{"question_id": 1, "debug_data": [
        dict(time=float(t), informative_score=0.0,
             relevance_score=1.0 if 4 <= t <= 14 else 0.0,
             uncertainty_score=0.0) for t in range(40)]}]
    pred_path = tmp_path / "qvh_pred.jsonl"
    pred_path.write_text("\n".join(json.dumps(p) for p in preds))
    gold = [{"qid": 1, "duration": 40, "relevant_windows": [[4, 14]],
             "relevant_clip_ids": [2, 3], "saliency_scores": [[4, 4, 4]] * 2}]
    gold_path = tmp_path / "qvh_gold.json"
    gold_path.write_text(json.dumps(gold))
    params_path = tmp_path / "params.json"
    params_path.write_text(json.dumps({"charades": {
        "alpha": 0.0, "beta": 1.0, "epsilon": 0.0, "uncertainty_threshold": 1.0}}))
    out_file = tmp_path / "qvh_metrics.json"
    cmd_evaluate(["--func", "qvh", "--pred_file", str(pred_path),
                  "--gold_file", str(gold_path), "--params_file", str(params_path),
                  "--relevance_threshold", "0.5", "--output_file", str(out_file)])
    metrics = json.loads(out_file.read_text())
    assert metrics["brief"]["MR-full-R1@0.7"] == 100.0


def test_cli_infer_live_demo_branch(video_dir, tmp_path):
    from aha_tpu.cli import cmd_infer

    out = tmp_path / "arl.json"
    ticks = tmp_path / "ticks.json"
    ticks.write_text(json.dumps({"arl_scout": {"ticks": [1.0], "label": "t"}}))
    cmd_infer([
        "--test_dataset", "arl_scout",
        "--model_preset", "tiny",
        "--input_dir", str(video_dir / "vidA.mp4"),
        "--output_fname", str(out),
        "--frame_fps", "1.0",
        "--tick_table", str(ticks),
    ])
    data = json.loads(out.read_text())
    assert data["gt_ticks"] == [1.0]
    assert len(data["debug_data"]) == 3
    assert "telemetry" in data


def test_cli_infer_w8a8_serving_mode(video_dir, tmp_path):
    """--w8a8 (the single-chip serving recipe): int8 weights + per-token
    int8 activations + int8 vision + fused width 8, end-to-end through
    cmd_infer. The backend force is process-global, so restore it."""
    from aha_tpu.cli import cmd_infer
    from aha_tpu.ops import quant

    out = tmp_path / "arl_w8a8.json"
    ticks = tmp_path / "ticks.json"
    ticks.write_text(json.dumps({"arl_scout": {"ticks": [1.0], "label": "t"}}))
    try:
        cmd_infer([
            "--test_dataset", "arl_scout",
            "--model_preset", "tiny",
            "--w8a8",
            "--input_dir", str(video_dir / "vidA.mp4"),
            "--output_fname", str(out),
            "--frame_fps", "1.0",
            "--tick_table", str(ticks),
        ])
        assert quant._FORCE_BACKEND == "w8a8"
    finally:
        quant._FORCE_BACKEND = None
    data = json.loads(out.read_text())
    assert len(data["debug_data"]) == 3
    assert all(np.isfinite(d["relevance_score"]) for d in data["debug_data"])


def test_cli_w8a8_int4_mutually_exclusive(tmp_path):
    from aha_tpu.cli import cmd_infer
    from aha_tpu.ops import quant

    try:
        with pytest.raises(SystemExit):
            cmd_infer([
                "--test_dataset", "arl_scout",
                "--model_preset", "tiny",
                "--w8a8", "--int4",
                "--input_dir", str(tmp_path),
                "--output_fname", str(tmp_path / "x.json"),
            ])
    finally:
        quant._FORCE_BACKEND = None


@pytest.mark.slow
def test_offline_baseline_driver(video_dir, tmp_path):
    """run_offline_baseline (ref test/inference.py:910-951): whole video +
    question -> one generated answer per example, JSONL."""
    cfg = aha_tiny(vocab_size=256)
    params, cfg, tokenizer = aha.build_model_and_tokenizer(cfg, seed=0)
    sess = build_session(params, cfg, tokenizer, InferConfig(
        frame_fps=1.0, frame_resolution=cfg.frame_resolution,
        stream_end_prob_threshold=0.5, kv_cache_policy="sink",
        kv_window=128, num_sink_tokens=8, max_new_tokens=6,
    ))
    test_file = tmp_path / "ob_test.json"
    test_file.write_text(json.dumps([
        {"question_id": "b1", "video": "vidA.mp4",
         "conversation": [{"role": "user", "content": "what happens?",
                           "time": 0}]},
    ]))
    out = tmp_path / "ob_pred.jsonl"
    results = benchmarks.run_offline_baseline(
        sess, test_fname=str(test_file), input_dir=str(video_dir),
        output_fname=str(out), frame_fps=1.0, max_num_frames=4,
    )
    assert len(results) == 1
    r = results[0]
    assert r["question_id"] == "b1" and r["question"] == "what happens?"
    assert isinstance(r["model_response"], list) and len(r["model_response"]) == 1
    assert isinstance(r["model_response"][0], str)
    assert [json.loads(l) for l in out.read_text().splitlines()] == results


@pytest.mark.slow
def test_streaming_qa_with_generation(video_dir, tmp_path):
    """Full streaming QA pass with generation triggers (magqa/youcook2 mode)."""
    cfg = aha_tiny(vocab_size=256)
    params, cfg, tokenizer = aha.build_model_and_tokenizer(cfg, seed=0)
    gen_session = build_session(params, cfg, tokenizer, InferConfig(
        frame_fps=1.0, frame_resolution=cfg.frame_resolution,
        stream_end_prob_threshold=0.0,  # fire every frame
        kv_cache_policy="sink", kv_window=128, num_sink_tokens=8,
        max_new_tokens=8, remove_assistant_turns=True,
    ))
    test_file = tmp_path / "gen_test.json"
    test_file.write_text(json.dumps([
        {"question_id": "g1", "video": "vidA.mp4",
         "conversation": [{"role": "user", "content": "narrate", "time": 0}]},
    ]))
    out = tmp_path / "gen_pred.jsonl"
    results = benchmarks.run_streaming_qa(
        gen_session, test_fname=str(test_file), input_dir=str(video_dir),
        output_fname=str(out), frame_fps=1.0, max_num_frames=5,
        grounding_mode=False,
    )
    assert len(results) == 1
    turns = results[0]["model_response_list"]
    assert sum(t["role"] == "assistant" for t in turns) == 3  # one per frame
    assert all(isinstance(t["content"], str) for t in turns)
    assert len(results[0]["debug_data"]) == 3


def _write_qa_file(path, videos, with_missing=True):
    entries = [
        {"question_id": f"q{i}", "video": f"{v}.mp4",
         "conversation": [{"role": "user", "content": "what?", "time": 0}]}
        for i, v in enumerate(videos)
    ]
    if with_missing:
        entries.insert(1, {"question_id": "qX", "video": "missing.mp4",
                           "conversation": [{"role": "user", "content": "?",
                                             "time": 0}]})
    path.write_text(json.dumps(entries))


def test_streaming_qa_multi_matches_solo(session, video_dir, tmp_path):
    """`aha infer --concurrent_streams N` (batched serving driver) produces
    the same per-stream outputs as the solo driver; 3 videos at batch=2
    exercises both grouping and the padded final group."""
    write_fake_video(video_dir / "vidC.mp4", n_frames=16)
    test_file = tmp_path / "multi_test.json"
    _write_qa_file(test_file, ["vidA", "vidB", "vidC"])
    # one stream with NO user turn: solo and multi must use the same ""
    # query prefix (regression: multi used to skip the prefix entirely)
    entries = json.loads(test_file.read_text())
    entries.append({"question_id": "qE", "video": "vidC.mp4",
                    "conversation": []})
    test_file.write_text(json.dumps(entries))
    common = dict(test_fname=str(test_file), input_dir=str(video_dir),
                  frame_fps=1.0, max_num_frames=10, grounding_mode=True)
    solo = benchmarks.run_streaming_qa(
        session, output_fname=str(tmp_path / "solo.jsonl"), **common)
    multi = benchmarks.run_streaming_qa_multi(
        session, batch=2, output_fname=str(tmp_path / "multi.jsonl"), **common)
    assert [r["question_id"] for r in multi] == [r["question_id"] for r in solo]
    for s, m in zip(solo, multi):
        assert m["model_response_list"] == s["model_response_list"]
        assert m["video_duration"] == s["video_duration"]
        assert len(m["debug_data"]) == len(s["debug_data"])
        for x, y in zip(s["debug_data"], m["debug_data"]):
            for k in x:
                # both sides are rounded to 3 significant figures
                np.testing.assert_allclose(y[k], x[k], rtol=2e-3, atol=1e-3)
    lines = [json.loads(l) for l in (tmp_path / "multi.jsonl").read_text().splitlines()]
    assert lines == multi


@pytest.mark.slow
def test_streaming_qa_multi_generation_matches_solo(video_dir, tmp_path):
    """Generation mode (magqa-style): batched trigger + decode path equals
    per-video solo sessions through the driver layer."""
    cfg = aha_tiny(vocab_size=256)
    params, cfg, tokenizer = aha.build_model_and_tokenizer(cfg, seed=0)
    infer_cfg = InferConfig(
        frame_fps=1.0, frame_resolution=cfg.frame_resolution,
        stream_end_prob_threshold=0.0,  # fire every frame
        kv_cache_policy="sink", kv_window=128, num_sink_tokens=8,
        max_new_tokens=8, remove_assistant_turns=True,
    )
    gen_session = build_session(params, cfg, tokenizer, infer_cfg)
    test_file = tmp_path / "gen_multi.json"
    _write_qa_file(test_file, ["vidA", "vidB"], with_missing=False)
    common = dict(test_fname=str(test_file), input_dir=str(video_dir),
                  frame_fps=1.0, max_num_frames=4, grounding_mode=False)
    solo = benchmarks.run_streaming_qa(
        gen_session, output_fname=str(tmp_path / "solo.jsonl"), **common)
    multi = benchmarks.run_streaming_qa_multi(
        gen_session, batch=2, output_fname=str(tmp_path / "multi.jsonl"), **common)
    assert len(multi) == len(solo) == 2
    for s, m in zip(solo, multi):
        s_turns = s["model_response_list"]
        m_turns = m["model_response_list"]
        assert [t["role"] for t in m_turns] == [t["role"] for t in s_turns]
        assert [t["content"] for t in m_turns] == [t["content"] for t in s_turns]
        np.testing.assert_allclose([t["time"] for t in m_turns],
                                   [t["time"] for t in s_turns])
        assert len(m["debug_data"]) == len(s["debug_data"])
        for x, y in zip(s["debug_data"], m["debug_data"]):
            for k in x:
                np.testing.assert_allclose(y[k], x[k], rtol=2e-3, atol=1e-3)


def test_tvsum_title_ablation(session, video_dir, tmp_path):
    caption_file = tmp_path / "cap.tsv"
    caption_file.write_text("c\ti\tt\tu\tl\nGA\tvidA\treal title\tu\t0:24\n")
    table = tmp_path / "titles.json"
    table.write_text(json.dumps({
        "vidA": {"ambiguous_title": "something happens",
                 "unrelated_title": "baking bread"}}))
    out = tmp_path / "pred_abl.json"
    results = benchmarks.run_tvsum(
        session, input_dir=str(video_dir), caption_file=str(caption_file),
        video_metadata_file=str(tmp_path / "m.json"), output_fname=str(out),
        frame_fps=1.0, title_ablation="ambiguous", title_table=str(table),
        seed=0,
    )
    assert len(results) == 1 and len(results[0]["debug_data"]) == 3


def test_cli_visualize_hisum_sota(tmp_path):
    """SOTA comparison panel (ref test/visualize.py hisum branch): computes
    our metrics from a pred file + h5 gold and writes the grouped bar
    figure."""
    import h5py

    rng = np.random.default_rng(0)
    h5_path = tmp_path / "gold.h5"
    preds = []
    with h5py.File(h5_path, "w") as hdf:
        for i in range(3):
            T = 30
            gt = rng.random(T)
            hdf.create_group(f"video_{i}").create_dataset("gtscore", data=gt)
            debug = [dict(time=t, informative_score=float(gt[min(t, T - 1)]),
                          relevance_score=float(gt[min(t, T - 1)]),
                          uncertainty_score=0.1) for t in range(T)]
            preds.append({"video_uuid": f"v{i}", "h5_identifier": f"video_{i}",
                          "debug_data": debug, "categories": ["catA"]})
    pred_file = tmp_path / "preds.json"
    pred_file.write_text(json.dumps(preds))
    params_file = tmp_path / "params.json"
    params_file.write_text(json.dumps({"hisum": {
        "alpha": 1.0, "beta": 1.0, "epsilon": 0.0, "uncertainty_threshold": 0.0}}))

    from aha_tpu.cli import main
    out_dir = tmp_path / "figs"
    rc = main(["visualize", "--func", "hisum_sota",
               "--pred_file", str(pred_file), "--gold_file", str(h5_path),
               "--params_file", str(params_file), "--output", str(out_dir)])
    assert rc == 0
    assert (out_dir / "hisum_results_comparison.png").exists()


def test_cli_visualize_pred_vs_gt_gold_formats(tmp_path):
    """pred_vs_gt accepts the reference's native gold formats (ref
    test/visualize.py:137-330): TVSum annotation TSV and HiSum h5 (keyed by
    h5_identifier), in addition to a plain JSON uuid->scores map."""
    import h5py

    from aha_tpu.cli import main

    T = 24
    debug = [dict(time=t, informative_score=0.5, relevance_score=0.4,
                  uncertainty_score=0.1) for t in range(T)]
    preds = [{"video_uuid": "vidA", "h5_identifier": "video_0",
              "debug_data": debug}]
    pred_file = tmp_path / "preds.json"
    pred_file.write_text(json.dumps(preds))
    params_file = tmp_path / "params.json"
    params_file.write_text(json.dumps({"tvsum": {
        "alpha": 1.0, "beta": 1.0, "epsilon": 0.0,
        "uncertainty_threshold": 0.0}}))

    # TVSum TSV gold: two annotators averaged, /5 normalized
    tsv = tmp_path / "anno.tsv"
    scores = ",".join(["3"] * T)
    tsv.write_text(f"vidA\tGA\t{scores}\nvidA\tGA\t{scores}\n")
    out_tsv = tmp_path / "figs_tsv"
    rc = main(["visualize", "--func", "pred_vs_gt",
               "--pred_file", str(pred_file), "--gold_file", str(tsv),
               "--params_file", str(params_file), "--output", str(out_tsv)])
    assert rc == 0 and (out_tsv / "vidA.png").exists()

    # HiSum h5 gold: looked up via each prediction's h5_identifier
    h5_path = tmp_path / "gold.h5"
    with h5py.File(h5_path, "w") as hdf:
        hdf.create_group("video_0").create_dataset(
            "gtscore", data=np.linspace(0, 1, T))
    out_h5 = tmp_path / "figs_h5"
    rc = main(["visualize", "--func", "pred_vs_gt",
               "--pred_file", str(pred_file), "--gold_file", str(h5_path),
               "--params_file", str(params_file), "--params_key", "tvsum",
               "--output", str(out_h5)])
    assert rc == 0 and (out_h5 / "vidA.png").exists()


def test_visualize_gt_alignment_rules(tmp_path):
    """Per-video GT alignment for the overlay plots: TVSum TSV gold is
    per-ORIGINAL-frame and must be indexed by true_frames_list (ref
    visualize.py tvsum branch: vid_ground_truth[true_frame]); HiSum h5
    pairs gtscore[i-1] with debug_data[i]. Regression for the round-3
    advisor finding: gt[:n] prefix truncation on real TVSum data (GT
    length >> pred length) plotted the first raw frames of GT against the
    whole prediction."""
    import h5py

    from aha_tpu.cli import main
    from aha_tpu.drivers import visualize as viz

    T = 24                        # sampled prediction frames
    G = 700                       # raw video frames (per-frame TSV GT)
    rng = np.random.default_rng(0)
    tfl = sorted(rng.choice(G, size=T, replace=False).tolist())
    debug = [dict(time=t, informative_score=0.5, relevance_score=0.4,
                  uncertainty_score=0.1) for t in range(T)]
    pred = {"video_uuid": "vidA", "h5_identifier": "video_0",
            "debug_data": debug, "true_frames_list": tfl}

    gt_full = rng.random(G)
    aligned, off = viz.align_gt_to_pred(pred, gt_full, "tvsum_tsv")
    assert off == 0
    np.testing.assert_array_equal(aligned, gt_full[np.asarray(tfl)])
    # out-of-range indices are clipped, not crashed
    pred_oob = dict(pred, true_frames_list=[0, 5, G + 50])
    aligned_oob, _ = viz.align_gt_to_pred(pred_oob, gt_full, "tvsum_tsv")
    np.testing.assert_array_equal(
        aligned_oob, gt_full[np.asarray([0, 5, G - 1])])

    # HiSum h5: debug_data[i] <-> gtscore[i-1] -> first pred entry dropped
    gt_h5 = rng.random(T)
    aligned_h5, off_h5 = viz.align_gt_to_pred(pred, gt_h5, "hisum_h5")
    assert off_h5 == 1
    np.testing.assert_array_equal(aligned_h5, gt_h5)
    # json gold is pre-aligned
    _, off_json = viz.align_gt_to_pred(pred, gt_h5, "json")
    assert off_json == 0

    # end-to-end through the CLI with GT length >> pred length
    pred_file = tmp_path / "preds.json"
    pred_file.write_text(json.dumps([pred]))
    params_file = tmp_path / "params.json"
    params_file.write_text(json.dumps({"tvsum": {
        "alpha": 1.0, "beta": 1.0, "epsilon": 0.0,
        "uncertainty_threshold": 0.0}}))
    tsv = tmp_path / "anno.tsv"
    scores = ",".join(["3"] * G)
    tsv.write_text(f"vidA\tGA\t{scores}\nvidA\tGA\t{scores}\n")
    out_dir = tmp_path / "figs"
    rc = main(["visualize", "--func", "pred_vs_gt",
               "--pred_file", str(pred_file), "--gold_file", str(tsv),
               "--params_file", str(params_file), "--output", str(out_dir)])
    assert rc == 0 and (out_dir / "vidA.png").exists()

    # h5 gold through the CLI exercises the pred_offset=1 path
    h5_path = tmp_path / "gold.h5"
    with h5py.File(h5_path, "w") as hdf:
        hdf.create_group("video_0").create_dataset(
            "gtscore", data=np.linspace(0, 1, T))
    out_h5 = tmp_path / "figs_h5"
    rc = main(["visualize", "--func", "pred_vs_gt",
               "--pred_file", str(pred_file), "--gold_file", str(h5_path),
               "--params_file", str(params_file), "--params_key", "tvsum",
               "--output", str(out_h5)])
    assert rc == 0 and (out_h5 / "vidA.png").exists()


@pytest.mark.slow
def test_cli_serve_end_to_end(tmp_path):
    """`aha serve`: JSONL requests -> decoded videos -> continuous-batching
    server -> JSONL results, with a bad request surfacing as an error line
    rather than killing the server."""
    cv2 = pytest.importorskip("cv2")
    from aha_tpu.cli import cmd_serve

    vids = tmp_path / "videos"
    vids.mkdir()
    for j, n in enumerate((6, 4)):
        w = cv2.VideoWriter(str(vids / f"v{j}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 32))
        for i in range(n):
            w.write(np.full((32, 48, 3), (40 * i + 30 * j) % 255, np.uint8))
        w.release()

    reqs = [
        {"key": "a", "video": str(vids / "v0.mp4"),
         "conversation": [{"role": "user", "time": 0.0, "content": "what?"}]},
        {"key": "bad", "video": str(vids / "missing.mp4"),
         "conversation": []},
        {"key": "b", "video": str(vids / "v1.mp4"),
         "conversation": [{"role": "user", "time": 1.0, "content": "and?"}]},
    ]
    inp = tmp_path / "req.jsonl"
    inp.write_text("".join(json.dumps(r) + "\n" for r in reqs))
    outp = tmp_path / "res.jsonl"

    cmd_serve([
        "--model_preset", "tiny", "--input", str(inp), "--output", str(outp),
        "--batch", "2", "--max_frames", "8", "--frame_fps", "1.0",
        "--stream_end_prob_threshold", "0.55", "--max_new_tokens", "4",
        "--kv_window", "64", "--num_sink_tokens", "4", "--emit_scores",
    ])
    lines = [json.loads(l) for l in outp.read_text().splitlines()]
    by_key = {l.get("key"): l for l in lines}
    assert set(by_key) == {"a", "b", "bad"}
    assert "error" in by_key["bad"]   # error line keeps the request key
    for k in ("a", "b"):
        assert isinstance(by_key[k]["responses"], list)
        assert by_key[k]["debug_data"], k  # per-frame scores present


@pytest.mark.slow
def test_cli_serve_live_stdin(tmp_path):
    """`aha serve` fed over a pipe with a SLOW producer: the first result
    must be written before the second request is even sent (live serving,
    not batch collection), and the server must exit cleanly at EOF."""
    import subprocess
    import sys as _sys
    import time as _time

    cv2 = pytest.importorskip("cv2")

    vids = tmp_path / "videos"
    vids.mkdir()
    for j in range(2):
        w = cv2.VideoWriter(str(vids / f"v{j}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 2.0, (48, 32))
        for i in range(6):
            w.write(np.full((32, 48, 3), (40 * i + 30 * j) % 255, np.uint8))
        w.release()
    outp = tmp_path / "res.jsonl"

    proc = subprocess.Popen(
        [_sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms', 'cpu');"
         "from aha_tpu.cli import main; import sys;"
         "sys.exit(main(sys.argv[1:]))",
         "serve", "--model_preset", "tiny", "--input", "-",
         "--output", str(outp), "--batch", "2", "--max_frames", "8",
         "--frame_fps", "1.0", "--stream_end_prob_threshold", "0.55",
         "--max_new_tokens", "4", "--kv_window", "64",
         "--num_sink_tokens", "4"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, cwd="/root/repo")

    def req(j):
        return json.dumps({
            "key": f"s{j}", "video": str(vids / f"v{j}.mp4"),
            "conversation": [{"role": "user", "time": 0.0,
                              "content": "?"}]}) + "\n"

    proc.stdin.write(req(0))
    proc.stdin.flush()
    # wait for the FIRST result line to land before sending request 2
    deadline = _time.time() + 300
    while _time.time() < deadline:
        if outp.exists() and outp.read_text().strip():
            break
        _time.sleep(0.5)
    first = [json.loads(l) for l in outp.read_text().splitlines()]
    assert [l["key"] for l in first] == ["s0"], first

    proc.stdin.write(req(1))
    proc.stdin.close()
    rc = proc.wait(timeout=300)
    err = proc.stderr.read()
    assert rc == 0, err
    lines = [json.loads(l) for l in outp.read_text().splitlines()]
    assert [l["key"] for l in lines] == ["s0", "s1"]
    assert "served 2 streams" in err

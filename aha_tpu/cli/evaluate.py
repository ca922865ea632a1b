"""`aha grid-search` / `aha evaluate` / `aha highlight` / `aha visualize`:
the post-hoc calibration, metric, and figure commands (reference
`test/grid_search.py`, `test/evaluate.py`, `test/highlight_generator.py`,
`test/visualize.py`)."""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from aha_tpu.cli._session import _resolve_params_file


def cmd_grid_search(argv):
    import numpy as np

    from aha_tpu.eval import grid_search as gs
    from aha_tpu.eval.scoring import qvh_to_charades_format
    from aha_tpu.eval.tvsum import load_annotations

    p = argparse.ArgumentParser(prog="aha grid-search")
    p.add_argument("--test_dataset", required=True,
                   choices=["tvsum", "tvsum_degraded", "hisum", "charades"])
    p.add_argument("--pred_file", required=True)
    p.add_argument("--gold_file", required=True)
    p.add_argument("--save_path", default="outputs/grid_search_params.json")
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)

    dataset = "tvsum" if args.test_dataset == "tvsum_degraded" else args.test_dataset
    if dataset in ("tvsum",):
        with open(args.pred_file) as f:
            predictions = json.load(f)
        ground_truths = load_annotations(args.gold_file)
        best = gs.run_grid_search(args.test_dataset, predictions,
                                  ground_truths=ground_truths,
                                  save_path=args.save_path, seed=args.seed)
    elif dataset == "hisum":
        import h5py

        with open(args.pred_file) as f:
            predictions = json.load(f)
        with h5py.File(args.gold_file, "r") as hdf:
            gtscores = {p_["h5_identifier"]: np.asarray(hdf[p_["h5_identifier"]]["gtscore"])
                        for p_ in predictions}
        best = gs.run_grid_search("hisum", predictions, gtscores=gtscores,
                                  save_path=args.save_path)
    else:
        predictions = [json.loads(l) for l in open(args.pred_file)]
        with open(args.gold_file) as f:
            golds = json.load(f)
        if golds and "answer" in golds[0] and "saliency_scores" in golds[0].get("answer", {}):
            golds = [qvh_to_charades_format(e) for e in golds]
        ground_truths = {e["question_id"]: e for e in golds}
        best = gs.run_grid_search("charades", predictions, ground_truths=ground_truths,
                                  save_path=args.save_path)
    print("Best parameters found:")
    print(best)


def cmd_evaluate(argv):
    import numpy as np

    from aha_tpu.eval import grounding, hisum, tvsum
    from aha_tpu.eval.scoring import combined_score, qvh_to_charades_format, traces_from_debug_data

    p = argparse.ArgumentParser(prog="aha evaluate")
    p.add_argument("--func", required=True,
                   choices=["tvsum", "hisum", "grounding", "magqa", "qvh",
                            "dense_captioning"])
    p.add_argument("--pred_file", required=True)
    p.add_argument("--gold_file", required=True)
    p.add_argument("--params_file", default="outputs/grid_search_params.json")
    p.add_argument("--params_key", default=None)
    p.add_argument("--output_file", default=None)
    p.add_argument("--judge_ckpt", default=None, help="magqa: converted judge dir")
    p.add_argument("--relevance_threshold", type=float, default=0.1)
    p.add_argument("--min_relevance_frames", type=int, default=5)
    args = p.parse_args(argv)

    if args.func == "magqa":
        return _evaluate_magqa(args)
    if args.func == "dense_captioning":
        from aha_tpu.eval.soda import eval_with_files

        out = eval_with_files(args.pred_file, args.gold_file)
        print(json.dumps(out, indent=2, default=float))
        if args.output_file:
            with open(args.output_file, "w") as f:
                json.dump(out, f, indent=2, default=float)
        return

    key = args.params_key or {"tvsum": "tvsum", "hisum": "hisum",
                              "grounding": "charades", "qvh": "charades"}[args.func]
    args.params_file = _resolve_params_file(args.params_file)
    with open(args.params_file) as f:
        bp = json.load(f)[key]
    a, b, e, t = bp["alpha"], bp["beta"], bp["epsilon"], bp["uncertainty_threshold"]

    if args.func == "qvh":
        from aha_tpu.eval import qvh as qvh_mod

        preds = [json.loads(l) for l in open(args.pred_file)]
        golds = [json.loads(l) for l in open(args.gold_file)] \
            if args.gold_file.endswith("l") else json.load(open(args.gold_file))
        submission = qvh_mod.submission_from_debug_data(
            preds, alpha=a, beta=b, epsilon=e, uncertainty_threshold=t,
            relevance_threshold=args.relevance_threshold,
            min_relevance_frames=args.min_relevance_frames,
        )
        out = qvh_mod.eval_submission(submission, golds, match_number=False)
        print(json.dumps(out, indent=2, default=float))
        if args.output_file:
            with open(args.output_file, "w") as f:
                json.dump(out, f, indent=2, default=float)
        return

    if args.func == "tvsum":
        with open(args.pred_file) as f:
            preds = json.load(f)
        annos = tvsum.load_annotations(args.gold_file)
        gt_dict, pred_dict = {}, {}
        for p_ in preds:
            vid = p_["video_uuid"]
            tr = traces_from_debug_data(p_["debug_data"])
            scores = combined_score(tr["informative"], tr["relevance"],
                                    tr["uncertainty"], a, b, e, t)
            true_frames = p_["true_frames_list"][: len(scores)]
            gt_all = np.asarray(annos[vid]["importance_scores"])
            gt_dict[vid] = gt_all[np.asarray(true_frames, np.int64)]
            pred_dict[vid] = scores
        overall = tvsum.evaluate_tvsum(gt_dict, pred_dict)
        per_cat = tvsum.evaluate_tvsum_per_category(gt_dict, pred_dict, annos)
        out = {"overall": overall, "per_category": per_cat}
    elif args.func == "hisum":
        import h5py

        with open(args.pred_file) as f:
            preds = json.load(f)
        gt_dict, pred_dict = {}, {}
        with h5py.File(args.gold_file, "r") as hdf:
            for p_ in preds:
                tr = traces_from_debug_data(p_["debug_data"])
                scores = combined_score(tr["informative"], tr["relevance"],
                                        tr["uncertainty"], a, b, e, t)
                gt = np.asarray(hdf[p_["h5_identifier"]]["gtscore"])
                n = min(len(scores), len(gt))
                # ref alignment: debug_data[i] <-> gtscore[i-1]
                gt_dict[p_["video_uuid"]] = gt[: n - 1]
                pred_dict[p_["video_uuid"]] = scores[1:n]
        out = hisum.evaluate_scores(gt_dict, pred_dict, spearman_kendall=True)
    else:  # grounding
        preds = [json.loads(l) for l in open(args.pred_file)]
        with open(args.gold_file) as f:
            golds = json.load(f)
        if golds and "answer" in golds[0] and "saliency_scores" in golds[0].get("answer", {}):
            golds = [qvh_to_charades_format(g) for g in golds]
        golds = {g["question_id"]: g for g in golds}
        out = grounding.evaluate_grounding(preds, golds, a, b, e, t)

    print(json.dumps(out, indent=2, default=float))
    if args.output_file:
        with open(args.output_file, "w") as f:
            json.dump(out, f, indent=2, default=float)


def _evaluate_magqa(args):
    from aha_tpu.eval import llm_judge

    preds = [json.loads(l) for l in open(args.pred_file)]
    with open(args.gold_file) as f:
        gold = json.load(f)
    if not args.judge_ckpt:
        print("magqa needs --judge_ckpt (a converted Qwen2-style judge), or use "
              "llm_judge.to_openai_batch_input for the remote-judge path")
        return
    import jax.numpy as jnp

    from aha_tpu.config import qwen2_7b
    from aha_tpu.models.loader import load_params
    from aha_tpu.tokenization import build_stream_tokenizer

    cfg = qwen2_7b()
    params = load_params(args.judge_ckpt, cfg, dtype=jnp.bfloat16)
    tok = build_stream_tokenizer(args.judge_ckpt)
    judge = llm_judge.LocalJudge(params, cfg, tok)
    scored = llm_judge.magqa_score_matrices(preds, gold, judge)
    if args.output_file:
        with open(args.output_file, "w") as f:
            for ex in scored:
                f.write(json.dumps(ex) + "\n")
    print(json.dumps(llm_judge.analyze_magqa(scored), indent=2))


def cmd_highlight(argv):
    from aha_tpu.eval import highlight

    p = argparse.ArgumentParser(prog="aha highlight")
    p.add_argument("--pred_file", required=True, help="driver output JSON (tvsum format)")
    p.add_argument("--video_uuid", required=True)
    p.add_argument("--video_path", required=True)
    p.add_argument("--output_filepath", default="highlight_video.mp4")
    p.add_argument("--max_duration", type=int, required=True)
    p.add_argument("--params_file", default="outputs/grid_search_params.json")
    p.add_argument("--source_fps", type=float, required=True)
    args = p.parse_args(argv)

    with open(args.pred_file) as f:
        preds = json.load(f)
    pred = next(p_ for p_ in preds if p_["video_uuid"] == args.video_uuid)
    a, b, e = highlight.load_calibrated_params(_resolve_params_file(args.params_file))
    result = highlight.generate_highlight(
        pred["debug_data"], pred["true_frames_list"], args.max_duration,
        alpha=a, beta=b, epsilon=e, source_fps=args.source_fps,
        video_path=args.video_path, output_path=args.output_filepath,
    )
    print(json.dumps({k: v for k, v in result.items() if k != "highlight_indices"}))


def cmd_visualize(argv):
    """Plot pred-vs-GT overlays and SOTA comparison panels
    (ref test/visualize.py driven by paths.yaml + grid-search params)."""
    p = argparse.ArgumentParser(prog="aha visualize")
    p.add_argument("--func", required=True,
                   choices=["hisum_sota", "tvsum_sota", "pred_vs_gt"])
    p.add_argument("--pred_file", default=None,
                   help="driver prediction json (required for hisum_sota / "
                        "pred_vs_gt; tvsum_sota reads --metrics_file)")
    p.add_argument("--gold_file", default=None,
                   help="hisum_sota: .h5; pred_vs_gt: json uuid->scores, "
                        "TVSum annotation .tsv, or HiSum .h5 "
                        "(ref visualize.py tvsum/hisum branches)")
    p.add_argument("--metrics_file", default=None, help="tvsum_sota: evaluate output json")
    p.add_argument("--params_file", default="outputs/grid_search_params.json")
    p.add_argument("--params_key", default=None)
    p.add_argument("--output", default="outputs/figures")
    p.add_argument("--max_show", type=int, default=5)
    args = p.parse_args(argv)

    from aha_tpu.drivers import visualize as viz

    if args.func in ("hisum_sota", "pred_vs_gt") and not args.gold_file:
        p.error(f"--gold_file is required for --func {args.func}")
    if args.func in ("hisum_sota", "pred_vs_gt") and not args.pred_file:
        p.error(f"--pred_file is required for --func {args.func}")
    if args.func == "tvsum_sota" and not (args.metrics_file or args.pred_file):
        p.error("--metrics_file is required for --func tvsum_sota")
    os.makedirs(args.output, exist_ok=True)
    args.params_file = _resolve_params_file(args.params_file)
    if args.func == "hisum_sota":
        with open(args.params_file) as f:
            params = json.load(f)[args.params_key or "hisum"]
        out = viz.hisum_sota_figure(
            args.pred_file, args.gold_file, params,
            os.path.join(args.output, "hisum_results_comparison.png"))
        print(json.dumps(out, indent=2, default=float))
    elif args.func == "tvsum_sota":
        with open(args.metrics_file or args.pred_file) as f:
            metrics = json.load(f)
        path = viz.tvsum_sota_figure(
            metrics, os.path.join(args.output, "tvsum_results_comparison.png"))
        print(path)
    else:
        gt, gold_kind = _load_gt_scores(args.gold_file, args.pred_file)

        def gt_for(pred):
            g = gt.get(pred["video_uuid"])
            if g is None:
                return None
            # per-video GT alignment: TVSum TSV gold is per-original-frame
            # and must be indexed by true_frames_list; HiSum h5 gold pairs
            # gtscore[i-1] with debug_data[i] (ref visualize.py tvsum/hisum
            # branches; same rules as grid_search.py / cmd_evaluate).
            return viz.align_gt_to_pred(pred, g, gold_kind)

        paths = viz.visualize_benchmark(
            args.pred_file, args.params_file, args.params_key or "tvsum",
            gt_for, args.output, max_videos=args.max_show)
        print("\n".join(paths))


def _load_gt_scores(gold_file: str, pred_file: str) -> tuple[dict, str]:
    """(uuid -> GT scores, gold_kind) from any of the reference's gold
    formats (ref test/visualize.py:137-330): TVSum annotation TSV
    (per-original-frame), HiSum h5 (keyed by each prediction's
    h5_identifier), or a plain JSON uuid->scores map. gold_kind in
    {"tvsum_tsv", "hisum_h5", "json"} tells the caller which per-video
    alignment rule applies (drivers.visualize.align_gt_to_pred)."""
    ext = os.path.splitext(gold_file)[1].lower()
    if ext == ".tsv":
        from aha_tpu.eval import tvsum

        return {uid: np.asarray(a["importance_scores"])
                for uid, a in tvsum.load_annotations(gold_file).items()}, "tvsum_tsv"
    if ext in (".h5", ".hdf5"):
        import h5py

        with open(pred_file) as f:
            preds = json.load(f)
        out = {}
        with h5py.File(gold_file, "r") as hdf:
            for pr in preds:
                h5_id = pr.get("h5_identifier")
                if h5_id is not None and h5_id in hdf:
                    out[pr["video_uuid"]] = np.asarray(hdf[h5_id]["gtscore"])
        return out, "hisum_h5"
    with open(gold_file) as f:
        return {k: np.asarray(v) for k, v in json.load(f).items()}, "json"

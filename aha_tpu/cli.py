"""Command-line interface: `python -m aha_tpu.cli <command> ...`.

Replaces the reference's per-task entry points
(`python -m test.inference` / `test.grid_search` / `test.evaluate` /
`test.highlight_generator` / `train.py` driven by `scripts/*.sh`) with one
dispatcher. Flag names mirror `LiveTestArguments` / `LiveTrainingArguments`
(`/root/reference/models/arguments_live.py:5-83`) so reference run scripts
port mechanically.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# The reference repo ships its published grid-search calibration at
# outputs/grid_search_params.json; the rebuild commits those values so
# evaluate/highlight/visualize work out of the box before the user ever
# runs `aha grid-search`.
_DEFAULT_PARAMS_FILE = "configs/grid_search_params.default.json"


def _resolve_params_file(path: str) -> str:
    """Fall back to the committed reference calibration when `path`
    (normally outputs/grid_search_params.json) does not exist yet."""
    if os.path.exists(path):
        return path
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (_DEFAULT_PARAMS_FILE,
                 os.path.join(repo_root, _DEFAULT_PARAMS_FILE)):
        if os.path.exists(cand):
            print(f"[aha] {path} not found; using committed calibration "
                  f"{cand}", file=sys.stderr)
            return cand
    return path


def _adopt_checkpoint_config(cfg, weights_path):
    """Adopt structural fields from a checkpoint dir's config.json
    (REAL_WEIGHTS runbook §1 requires the file). vocab_size MUST follow
    the checkpoint's embed table: id-indexed buffers (repetition counts,
    lm_head argmax) are sized by cfg.llm.vocab_size and jax clips
    out-of-range indices silently instead of erroring."""
    import dataclasses
    import json

    if not weights_path or not os.path.isdir(weights_path):
        return cfg
    cj = os.path.join(weights_path, "config.json")
    if not os.path.exists(cj):
        return cfg
    with open(cj) as f:
        hf = json.load(f)
    v = hf.get("vocab_size")
    if v and int(v) != cfg.llm.vocab_size:
        print(f"[aha] adopting vocab_size={v} from {cj} "
              f"(preset had {cfg.llm.vocab_size})", file=sys.stderr)
        cfg = cfg.replace(llm=dataclasses.replace(cfg.llm, vocab_size=int(v)))
    return cfg


def _build_session(args):
    import jax.numpy as jnp

    from aha_tpu.config import InferConfig, aha_7b, aha_tiny
    from aha_tpu.models import aha
    from aha_tpu.ops import quant
    from aha_tpu.streaming.session import build_session

    cfg = aha_tiny() if args.model_preset == "tiny" else aha_7b()
    cfg = _adopt_checkpoint_config(cfg, args.llm_pretrained)
    synthetic = bool(getattr(args, "synthetic_weights", False))
    if synthetic:
        # on-chip product rehearsal without a checkpoint: seeded leaf-wise
        # materialization in the FINAL dtype (a full-precision 7B cannot
        # fit one 16 GB chip even transiently, so quantize-after-init is
        # not an option). Same leaves as bench._random_params — scores are
        # meaningless, throughput/latency/memory are the real article.
        from aha_tpu.models.loader import materialize_random_params
        from aha_tpu.tokenization import build_stream_tokenizer

        mode = ("int4" if getattr(args, "int4", False) else
                "int8" if (args.int8 or getattr(args, "w8a8", False))
                else None)
        tokenizer = build_stream_tokenizer(
            args.tokenizer_pretrained,
            frame_num_tokens=cfg.frame_num_tokens,
            vocab_size=cfg.llm.vocab_size)
        cfg = cfg.replace(v_placeholder_id=tokenizer.v_placeholder_id,
                          eos_token_id=tokenizer.eos_token_id)
        params = materialize_random_params(cfg, mode)
    else:
        params, cfg, tokenizer = aha.build_model_and_tokenizer(
            cfg,
            tokenizer_pretrained=args.tokenizer_pretrained,
            weights_path=args.llm_pretrained,
            dtype=jnp.dtype(cfg.dtype),
        )
    lora, lora_scale = None, 0.0
    if getattr(args, "lora_pretrained", None):
        # published adapter-only artifact (ref modeling_live.py:149-163):
        # dense modules_to_save override the base; adapters apply at
        # matmul time (quantization below never touches them)
        from aha_tpu.models import loader

        lora, overrides, lora_scale = loader.load_adapter(
            args.lora_pretrained, cfg, dtype=jnp.float32)
        params = loader.apply_overrides(params, overrides)
    q_vision = bool(getattr(args, "vision_int8", False))
    if getattr(args, "w8a8", False):
        # serving mode: dynamic per-token int8 activations onto the int8
        # MXU (ops/quant.qlinear_w8a8). Implies int8 weights (the backend
        # only fires on quantized kernels) + the int8 vision tower (it is
        # compute-bound, 215 -> 265 fps), and for SINGLE-stream sessions
        # extends the fused scoring width to 8 — halved MXU cost moves the
        # weight-stream crossover from k=4 to k=8 (255-261 vs 187 fps B=1
        # scan on v5e-1). Batched serving keeps width 4: at B=8 the batch
        # rows already feed the MXU and k=8 regresses (208 vs 221 fps
        # aggregate — BASELINE.md round 3). ~1%% relative hidden-state
        # error; benchmark-parity runs skip it.
        if getattr(args, "int4", False):
            raise SystemExit("--w8a8 and --int4 are mutually exclusive: the "
                             "w8a8 backend bypasses the fused int4 kernel")
        args.int8 = True
        q_vision = True
        if (getattr(args, "fused_score_frames", 4) == 4
                and getattr(args, "batch", 1) == 1):
            args.fused_score_frames = 8
        quant._FORCE_BACKEND = "w8a8"
    if synthetic:
        pass   # materialized directly in the final (quantized) form above
    elif getattr(args, "int4", False):
        # packed int4 (group-wise, fused Pallas unpack-matmul): the
        # HBM-constrained option — 4.2 GB of 7B weights; int8 is the
        # throughput recipe (BASELINE.md)
        params = quant.quantize_params(params, bits=4,
                                       quantize_vision=q_vision)
    elif args.int8:
        params = quant.quantize_params(params, quantize_vision=q_vision)
    elif q_vision:
        params = quant.quantize_params(params, quantize_vision=True,
                                       keep_dense=("llm",))
    infer_cfg = InferConfig(
        frame_fps=args.frame_fps,
        frame_resolution=cfg.frame_resolution,
        grounding_mode=args.grounding_mode,
        stream_end_prob_threshold=args.stream_end_prob_threshold,
        threshold_z=args.threshold_z,
        first_n_frames_no_generate=getattr(
            args, "first_n_frames_no_generate", 0),
        running_list_length=getattr(args, "running_list_length", 20),
        response_min_interval_frames=getattr(
            args, "response_min_interval_frames", None),
        stream_end_score_sum_threshold=args.stream_end_score_sum_threshold,
        remove_assistant_turns=args.remove_assistant_turns,
        score_heads=tuple(args.score_heads.split(",")),
        repetition_penalty=args.repetition_penalty,
        max_new_tokens=args.max_new_tokens,
        kv_cache_policy=args.kv_cache_policy,
        kv_window=args.kv_window,
        num_sink_tokens=args.num_sink_tokens,
        kv_cache_dtype=getattr(args, "kv_cache_dtype", "auto"),
        kv_mask_mode=getattr(args, "kv_mask_mode", "hf"),
        spec_decode_tokens=getattr(args, "spec_decode_tokens", 4),
        spec_decode_tokens_max=getattr(args, "spec_decode_tokens_max", 8),
        fused_score_frames=getattr(args, "fused_score_frames", 4),
        retire_defer=getattr(args, "retire_defer", 1),
    )
    return build_session(params, cfg, tokenizer, infer_cfg,
                         lora=lora, lora_scale=lora_scale)


def _add_infer_flags(p: argparse.ArgumentParser):
    p.add_argument("--model_preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--llm_pretrained", default=None,
                   help="converted/HF checkpoint dir (random init if absent)")
    p.add_argument("--tokenizer_pretrained", default=None)
    p.add_argument("--lora_pretrained", default=None,
                   help="peft adapter-only checkpoint dir (the published "
                        "reference artifact): adapters + modules_to_save "
                        "are applied on top of --llm_pretrained")
    p.add_argument("--int8", action="store_true", help="int8 weight quantization")
    p.add_argument("--int4", action="store_true",
                   help="packed int4 weights (fused Pallas kernel; smallest "
                        "HBM footprint, slower than --int8)")
    p.add_argument("--synthetic_weights", action="store_true",
                   help="seeded random params materialized leaf-wise on "
                        "device in the final (quantized) dtype — on-chip "
                        "product rehearsal without a checkpoint (scores "
                        "meaningless; throughput/latency/HBM real)")
    p.add_argument("--vision_int8", action="store_true",
                   help="also quantize the SigLIP tower (default dense). "
                        "Pays under AHA_QUANT_MATMUL=w8a8: the tower is "
                        "compute-bound, so the int8 MXU lifts encode 215 -> "
                        "265 fps on the v5e-1 at ~2%% frame-embed error; "
                        "weight-only ties dense (BASELINE.md round 3)")
    p.add_argument("--w8a8", action="store_true",
                   help="serving mode: int8 weights + dynamic per-token "
                        "int8 activations on the int8 MXU + int8 vision "
                        "tower + fused width 8. Fastest single-chip recipe "
                        "(255 fps B=1 scan / 265 fps encode on v5e-1) at "
                        "~1%% hidden-state error — use the default exact "
                        "modes for benchmark parity runs")
    p.add_argument("--test_dataset", required=True,
                   choices=["tvsum", "tvsum_degraded", "hisum", "youcook2",
                            "magqa", "charades", "generic",
                            "arl_scout", "hubble_space", "jkim_landing"])
    p.add_argument("--query", default=None,
                   help="live-video demo datasets: the running query")
    p.add_argument("--tick_table", default="configs/tick_tables/demo_ticks.json")
    p.add_argument("--start_sec", type=float, default=0.0,
                   help="live-video demos: drop the stream before this time "
                        "(the reference trims jkim_landing at 14:38)")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_fname", required=True)
    p.add_argument("--test_fname", default=None)
    p.add_argument("--caption_metadata_file", default=None)
    p.add_argument("--video_metadata_file", default=None)
    p.add_argument("--anno_file", default=None)
    p.add_argument("--hisum_h5_file", default=None)
    p.add_argument("--frame_fps", type=float, default=2.0)
    p.add_argument("--max_num_frames", type=int, default=400)
    p.add_argument("--grounding_mode", action="store_true")
    p.add_argument("--stream_end_prob_threshold", type=float, default=None)
    p.add_argument("--threshold_z", type=float, default=None)
    p.add_argument("--first_n_frames_no_generate", type=int, default=0)
    p.add_argument("--running_list_length", type=int, default=20)
    p.add_argument("--response_min_interval_frames", type=int, default=None)
    p.add_argument("--stream_end_score_sum_threshold", type=float, default=None)
    p.add_argument("--remove_assistant_turns", action="store_true")
    p.add_argument("--score_heads", default="relevance_score,informative_score")
    p.add_argument("--repetition_penalty", type=float, default=None)
    p.add_argument("--max_new_tokens", type=int, default=200)
    p.add_argument("--kv_cache_policy", default="sink",
                   choices=["sink", "sliding", "static", "none"])
    p.add_argument("--kv_window", type=int, default=2048)
    p.add_argument("--num_sink_tokens", type=int, default=32)
    p.add_argument("--kv_cache_dtype", default="auto", choices=["auto", "int8"],
                   help="int8: per-(slot, head) quantized KV cache — half "
                        "the cache HBM / attention DMA, ~0.5%% output error")
    p.add_argument("--spec_decode_tokens", type=int, default=4,
                   help="speculative decoding: tokens verified per decoder "
                        "pass (1 = off). EXACT greedy parity either way; "
                        "rejected drafts are free on TPU (BASELINE.md)")
    p.add_argument("--spec_decode_tokens_max", type=int, default=8,
                   help="acceptance-adaptive speculation ceiling: the spec "
                        "chunk widens to this while the on-device "
                        "acceptance EMA is high, narrows back when it "
                        "drops (<= spec_decode_tokens = fixed width)")
    p.add_argument("--fused_score_frames", type=int, default=4,
                   help="frames verified per decoder weight stream on the "
                        "scan scoring paths (1 = per-frame scan). EXACT "
                        "score/cache parity; 2.2x single-stream scan "
                        "throughput on v5e-1 (BASELINE.md round 3)")
    p.add_argument("--kv_mask_mode", default="hf", choices=["hf", "strict"],
                   help="hf: reference transformers-4.49 mask arithmetic "
                        "(post-fill chunks attend non-causally within the "
                        "chunk, like every published reference benchmark); "
                        "strict: true causal masking")
    p.add_argument("--no_query", action="store_true")
    p.add_argument("--title_ablation", default=None, choices=["ambiguous", "unrelated"])
    p.add_argument("--title_table", default=None)
    p.add_argument("--time_instruction_format", default=None)
    p.add_argument("--start_idx", type=int, default=0)
    p.add_argument("--end_idx", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--concurrent_streams", type=int, default=1,
                   help="streaming-QA datasets: serve N videos concurrently "
                        "in one batched engine (one weight pass scores a "
                        "frame for every stream; ~2.3x aggregate fps at N=8 "
                        "on v5e-1). Generation mode runs continuous "
                        "batching (a finished stream's slot is refilled "
                        "immediately). Identical per-stream outputs to N=1.")


def cmd_infer(argv):
    from aha_tpu.drivers import benchmarks

    p = argparse.ArgumentParser(prog="aha infer")
    _add_infer_flags(p)
    args = p.parse_args(argv)
    if args.grounding_mode or args.test_dataset in (
            "tvsum", "tvsum_degraded", "hisum",
            "arl_scout", "hubble_space", "jkim_landing"):
        # scoring-only passes need no stopping criterion
        if (args.stream_end_prob_threshold is None and args.threshold_z is None
                and args.stream_end_score_sum_threshold is None):
            args.grounding_mode = True
    session = _build_session(args)

    if args.test_dataset in ("arl_scout", "hubble_space", "jkim_landing"):
        # live-video demo branch (ref test/inference.py:796-855): score the
        # stream, detect ticks vs the hand-labeled table, report telemetry
        import os

        from aha_tpu.data import media
        from aha_tpu.drivers import live_video
        from aha_tpu.utils import telemetry

        default_queries = {
            "arl_scout": "what objects are in this room?",
            "hubble_space": "Launch of the Hubble Space Telescope, April 24-29 1990",
            "jkim_landing": "NASA Astronaut Jonny Kim Soyuz MS-27 Docking",
        }
        query = args.query or default_queries[args.test_dataset]
        if os.path.isdir(args.input_dir):
            frames, fps, _ = media.load_frame_folder(
                args.input_dir, output_size=session.args.frame_resolution,
                output_fps=args.frame_fps)
        else:
            frames, _ = media.decode_video(
                args.input_dir, output_fps=args.frame_fps,
                output_size=session.args.frame_resolution)
            fps = args.frame_fps
        if args.start_sec > 0:
            frames = frames[int(args.start_sec * fps):]
        gt_ticks = None
        if args.tick_table and os.path.exists(args.tick_table):
            try:
                gt_ticks = live_video.load_tick_table(args.tick_table, args.test_dataset)
            except KeyError:
                pass
        result = live_video.infer_on_live_video(
            session, frames, query, fps,
            output_dir=os.path.dirname(args.output_fname) or ".",
            gt_ticks=gt_ticks, monitor=telemetry.DeviceMonitor(),
        )
        with open(args.output_fname, "w") as f:
            json.dump(result, f)
        print(json.dumps({k: v for k, v in result.items() if k != "debug_data"},
                         default=float))
    elif args.test_dataset in ("tvsum", "tvsum_degraded"):
        benchmarks.run_tvsum(
            session,
            input_dir=args.input_dir,
            caption_file=args.caption_metadata_file,
            video_metadata_file=args.video_metadata_file,
            output_fname=args.output_fname,
            frame_fps=args.frame_fps,
            degraded=args.test_dataset == "tvsum_degraded",
            title_ablation=args.title_ablation,
            title_table=args.title_table,
            no_query=args.no_query,
            seed=args.seed,
        )
    elif args.test_dataset == "hisum":
        benchmarks.run_hisum(
            session,
            input_dir=args.input_dir,
            anno_file=args.anno_file,
            h5_file=args.hisum_h5_file,
            hisum_metadata=args.caption_metadata_file,
            video_metadata_file=args.video_metadata_file,
            output_fname=args.output_fname,
            frame_fps=args.frame_fps,
            no_query=args.no_query,
            seed=args.seed,
        )
    elif args.concurrent_streams > 1:
        benchmarks.run_streaming_qa_multi(
            session,
            batch=args.concurrent_streams,
            test_fname=args.test_fname,
            input_dir=args.input_dir,
            output_fname=args.output_fname,
            frame_fps=args.frame_fps,
            max_num_frames=args.max_num_frames,
            grounding_mode=args.grounding_mode,
            start_idx=args.start_idx,
            end_idx=args.end_idx,
            time_instruction_format=args.time_instruction_format,
        )
    else:
        benchmarks.run_streaming_qa(
            session,
            test_fname=args.test_fname,
            input_dir=args.input_dir,
            output_fname=args.output_fname,
            frame_fps=args.frame_fps,
            max_num_frames=args.max_num_frames,
            grounding_mode=args.grounding_mode,
            start_idx=args.start_idx,
            end_idx=args.end_idx,
            time_instruction_format=args.time_instruction_format,
        )


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


def cmd_demo(argv):
    """Live-video demo: score a video, detect ticks, write plot + stitched MP4."""
    import numpy as np

    from aha_tpu.data import media
    from aha_tpu.drivers import live_video
    from aha_tpu.utils import telemetry

    p = argparse.ArgumentParser(prog="aha demo")
    p.add_argument("--video", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--output_dir", default="outputs/demo")
    p.add_argument("--frame_fps", type=float, default=1.0)
    p.add_argument("--tick_table", default=None)
    p.add_argument("--tick_name", default=None)
    p.add_argument("--render_video", action="store_true")
    p.add_argument("--model_preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--llm_pretrained", default=None)
    p.add_argument("--tokenizer_pretrained", default=None)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--vision_int8", action="store_true",
                   help="quantize the SigLIP tower too (see aha infer)")
    p.add_argument("--w8a8", action="store_true",
                   help="serving mode: int8 weights + per-token int8 "
                        "activations + int8 vision + fused width 8 "
                        "(see aha infer --w8a8)")
    p.add_argument("--motion_skip_threshold", type=float, default=None,
                   help="skip scoring frames whose mean pixel change since "
                        "the last scored frame is below this (0..1, e.g. "
                        "0.02); their scores are held on the time grid. "
                        "Opt-in, beyond-reference (media.motion_mask)")
    p.add_argument("--motion_max_skip", type=int, default=8,
                   help="always score at least every Nth frame under "
                        "--motion_skip_threshold")
    args = p.parse_args(argv)
    args.grounding_mode = True
    args.stream_end_prob_threshold = None
    args.threshold_z = None
    args.stream_end_score_sum_threshold = None
    args.remove_assistant_turns = False
    args.score_heads = "relevance_score,informative_score"
    args.repetition_penalty = None
    args.max_new_tokens = 200
    args.kv_cache_policy = "sink"
    args.kv_window = 2048
    args.num_sink_tokens = 32
    session = _build_session(args)

    frames, _ = media.decode_video(args.video, output_fps=args.frame_fps,
                                   output_size=session.args.frame_resolution)
    gt_ticks = None
    if args.tick_table and args.tick_name:
        gt_ticks = live_video.load_tick_table(args.tick_table, args.tick_name)
    result = live_video.infer_on_live_video(
        session, frames, args.query, args.frame_fps,
        output_dir=args.output_dir, gt_ticks=gt_ticks,
        monitor=telemetry.DeviceMonitor(),
        motion_skip_threshold=args.motion_skip_threshold,
        motion_max_skip=args.motion_max_skip,
    )
    print(json.dumps({k: v for k, v in result.items() if k != "debug_data"},
                     default=float))
    if args.render_video:
        scores = np.asarray([d["relevance_score"] for d in result["debug_data"]])
        out = live_video.render_demo_video(
            frames, scores, args.frame_fps,
            f"{args.output_dir}/demo_stitched.mp4", ticks=result["ticks"])
        print(f"stitched demo video: {out}")


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


def cmd_train(argv):
    # multi-host bring-up FIRST: jax.distributed.initialize refuses to run
    # once any other call touches the backend (utils/dist.py), and model
    # build below does
    from aha_tpu.utils import dist as dist_utils

    dist_utils.maybe_init_distributed()

    from aha_tpu.config import AhaConfig, TrainConfig, aha_7b, aha_tiny, config_from_dict
    from aha_tpu.data.datasets import build_mixture_from_config
    from aha_tpu.models import aha
    from aha_tpu.train.trainer import train

    p = argparse.ArgumentParser(prog="aha train")
    p.add_argument("--model_preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--llm_pretrained", default=None)
    p.add_argument("--tokenizer_pretrained", default=None)
    p.add_argument("--dataset_config", required=True)
    p.add_argument("--output_dir", default="outputs/train")
    p.add_argument("--num_steps", type=int, default=None,
                   help="total MICRO-BATCH steps (one batch each; with "
                        "--grad_accum_steps G the optimizer updates every "
                        "G of them); alternatively --num_epochs")
    p.add_argument("--num_epochs", type=int, default=None,
                   help="epochs over the mixture (ref num_train_epochs); "
                        "converted to micro-batch steps as "
                        "len(dataset) // batch_size per epoch")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=2e-5)
    p.add_argument("--grad_accum_steps", type=int, default=2)
    p.add_argument("--mesh_data", type=int, default=-1)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--mesh_pipe", type=int, default=1,
                   help="GPipe pipeline stages over the decoder layers "
                        "(beyond-reference; parallel/pipeline.py)")
    p.add_argument("--pipe_microbatches", type=int, default=2)
    p.add_argument("--resume_from_checkpoint", default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--prefetch_batches", type=int, default=2,
                   help="batches decoded+collated ahead of the train step")
    p.add_argument("--decode_workers", type=int, default=2,
                   help="thread-pool workers for host video decode")
    p.add_argument("--video_head_stop_grad", action="store_true",
                   help="ablation: detach hidden states before the score "
                        "heads (ref video_head_live_llava_qwen.py:44-47)")
    p.add_argument("--remat_policy", default="full",
                   choices=["none", "full", "half", "dots", "dots_no_batch"],
                   help="trunk activation remat: 'full' = lowest HBM "
                        "(ref gradient_checkpointing), 'dots' saves matmul "
                        "outputs for a faster backward when memory allows")
    p.add_argument("--quantize_base", action="store_true",
                   help="QLoRA analog (ref NF4+LoRA): freeze the trunk as "
                        "int8, train bf16 adapters + dense finetune modules."
                        " Fits 7B LoRA fine-tuning on a single 16 GB chip.")
    p.add_argument("--quantize_bits", type=int, default=8, choices=[4, 8],
                   help="trunk quantization width for --quantize_base: 8 = "
                        "per-channel int8; 4 = group-wise packed int4 (the "
                        "ref NF4 analog, ~4.1 GiB trunk) — trainable via "
                        "the transposed fused-matmul VJP "
                        "(ops/pallas/fused_matmul.int4_qlinear)")
    p.add_argument("--lora_pretrained", default=None,
                   help="continue fine-tuning from a published peft adapter "
                        "dir (ref README continuation flow): adapters seed "
                        "the LoRA state, modules_to_save override the base")
    args = p.parse_args(argv)

    cfg = aha_tiny() if args.model_preset == "tiny" else aha_7b()
    cfg = _adopt_checkpoint_config(cfg, args.llm_pretrained)
    params, cfg, tokenizer = aha.build_model_and_tokenizer(
        cfg, tokenizer_pretrained=args.tokenizer_pretrained,
        weights_path=args.llm_pretrained,
    )
    if args.video_head_stop_grad:
        cfg = cfg.replace(video_head_stop_grad=True)
    lora_init = None
    if args.lora_pretrained:
        from aha_tpu.models import loader
        from aha_tpu.train.lora import lora_scale as _lscale

        lora_init, overrides, ad_scale = loader.load_adapter(
            args.lora_pretrained, cfg)
        params = loader.apply_overrides(params, overrides)
        if abs(ad_scale - _lscale(TrainConfig().lora)) > 1e-6:
            print(f"warning: adapter alpha/r scale {ad_scale} != training "
                  f"config scale {_lscale(TrainConfig().lora)} — adjust "
                  f"TrainConfig.lora to match the adapter")
    if args.quantize_base:
        from aha_tpu.ops.quant import quantize_params

        params = quantize_params(params, keep_dense=("projector", "lm_head"),
                                 bits=args.quantize_bits)
    train_cfg = TrainConfig(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        grad_accum_steps=args.grad_accum_steps,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        mesh_pipe=args.mesh_pipe,
        pipe_microbatches=args.pipe_microbatches,
        resume_from_checkpoint=args.resume_from_checkpoint,
        seed=args.seed,
        remat_policy=args.remat_policy,
    )
    dataset = build_mixture_from_config(args.dataset_config, tokenizer,
                                        system_prompt=train_cfg.system_prompt,
                                        frame_size=cfg.frame_resolution)
    num_steps = args.num_steps
    if num_steps is None:
        if args.num_epochs is None:
            p.error("one of --num_steps / --num_epochs is required")
        steps_per_epoch = max(len(dataset) // args.batch_size, 1)
        num_steps = args.num_epochs * steps_per_epoch

    # async input pipeline (SURVEY §7 hard part #5): thread-pool video
    # decode + prefetch ahead of the jitted step, so host decode overlaps
    # device compute instead of serializing with it
    import jax

    from aha_tpu.data.pipeline import batch_iterator
    from aha_tpu.parallel import mesh as mesh_lib

    m = mesh_lib.make_mesh(args.mesh_data, args.mesh_model, args.mesh_pipe)
    # multi-host data convention: when the data axis splits cleanly across
    # processes, each host decodes ONLY its own rows (batch_size/H local)
    # and the global batch is assembled per-host; otherwise fall back to
    # replicated loading (every host collates the identical full batch)
    n_proc = jax.process_count()
    per_host = (n_proc > 1 and args.batch_size % n_proc == 0
                and mesh_lib.data_axis_spans_processes(m))
    loader_bs = args.batch_size // n_proc if per_host else args.batch_size
    if n_proc > 1 and not per_host:
        print(f"multi-host replicated loading: batch {args.batch_size} or "
              f"mesh layout not splittable over {n_proc} processes — every "
              f"host decodes the full batch")
    batches = batch_iterator(
        dataset, tokenizer,
        batch_size=loader_bs,
        v_placeholder_id=cfg.v_placeholder_id,
        frame_num_tokens=cfg.frame_num_tokens,
        seed=args.seed,
        prefetch=args.prefetch_batches,
        num_workers=args.decode_workers,
        shard_across_hosts=per_host,
    )
    train(cfg, train_cfg, params, batches, total_steps=num_steps,
          device_mesh=m, lora_init=lora_init, use_wandb=args.wandb,
          per_host_batches=per_host)


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


def cmd_serve(argv):
    """Continuous-batching JSONL server: requests in, results out.

    Each input line is one request:
      {"key": "id", "video": "/path.mp4",
       "conversation": [{"role": "user", "time": 0.0, "content": "..."}]}
    Each output line (written the moment the stream retires, completion
    order): {"key", "responses", ["debug_data" with --emit_scores]}.

    Videos are decoded by a background thread pool ahead of admission, so
    host decode overlaps device serving; `--batch` slots run continuous
    batching (a retired stream's slot is refilled immediately —
    streaming/multi.MultiStreamServer). No reference analog: the
    reference serves one stream per process (test/inference.py:857-908)."""
    import queue as _queue
    import threading
    from concurrent.futures import ThreadPoolExecutor

    p = argparse.ArgumentParser(
        "aha serve", description="continuous-batching JSONL serving")
    p.add_argument("--model_preset", default="7b", choices=["7b", "tiny"])
    p.add_argument("--llm_pretrained", default=None)
    p.add_argument("--tokenizer_pretrained", default=None)
    p.add_argument("--lora_pretrained", default=None)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--int4", action="store_true")
    p.add_argument("--synthetic_weights", action="store_true",
                   help="seeded random device-materialized params "
                        "(on-chip rehearsal; see aha infer)")
    p.add_argument("--vision_int8", action="store_true",
                   help="quantize the SigLIP tower too (see aha infer)")
    p.add_argument("--w8a8", action="store_true",
                   help="serving mode: int8 weights + per-token int8 "
                        "activations + int8 vision + fused width 8 "
                        "(see aha infer --w8a8)")
    p.add_argument("--fused_score_frames", type=int, default=4,
                   help="frames verified per decoder weight stream on the "
                        "batched scoring paths (1 = per-frame)")
    p.add_argument("--input", default="-", help="requests JSONL (- = stdin)")
    p.add_argument("--output", default="-", help="results JSONL (- = stdout)")
    p.add_argument("--batch", type=int, default=8, help="concurrent slots")
    p.add_argument("--max_frames", type=int, default=400)
    p.add_argument("--frame_fps", type=float, default=2.0)
    p.add_argument("--decode_workers", type=int, default=2)
    p.add_argument("--emit_scores", action="store_true",
                   help="include per-frame score traces (debug_data)")
    p.add_argument("--stats", action="store_true",
                   help="run the instrumented path and print the wall-clock "
                        "phase split (admit/text/score/gen/host) to stderr "
                        "at exit — adds per-phase sync overhead")
    p.add_argument("--stream_end_prob_threshold", type=float, default=None)
    p.add_argument("--threshold_z", type=float, default=None)
    p.add_argument("--first_n_frames_no_generate", type=int, default=0)
    p.add_argument("--running_list_length", type=int, default=20)
    p.add_argument("--response_min_interval_frames", type=int, default=None)
    p.add_argument("--stream_end_score_sum_threshold", type=float, default=None)
    p.add_argument("--remove_assistant_turns", action="store_true")
    p.add_argument("--score_heads", default="relevance_score,informative_score")
    p.add_argument("--repetition_penalty", type=float, default=None)
    p.add_argument("--max_new_tokens", type=int, default=200)
    p.add_argument("--kv_cache_policy", default="sink",
                   choices=["sink", "sliding", "static", "none"])
    p.add_argument("--kv_window", type=int, default=2048)
    p.add_argument("--num_sink_tokens", type=int, default=32)
    p.add_argument("--kv_cache_dtype", default="auto", choices=["auto", "int8"])
    p.add_argument("--kv_mask_mode", default="hf", choices=["hf", "strict"])
    p.add_argument("--spec_decode_tokens", type=int, default=4,
                   help="speculative decoding: tokens verified per decoder "
                        "pass (1 = off); exact greedy parity either way")
    p.add_argument("--spec_decode_tokens_max", type=int, default=8,
                   help="acceptance-adaptive speculation ceiling (<= "
                        "spec_decode_tokens = fixed width)")
    p.add_argument("--retire_defer", type=int, default=1,
                   help="batched retirement: keep serving on device until "
                        "this many streams finish before returning to the "
                        "host (1 = refill slots immediately; higher = fewer "
                        "host round-trips, idle finished slots meanwhile)")
    p.add_argument("--mesh_data", type=int, default=1,
                   help="shard the slot batch over this many devices")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="tensor-parallel devices (serve bf16 7B on a v5e-4: "
                        "--mesh_model 4)")
    args = p.parse_args(argv)
    args.grounding_mode = False

    from aha_tpu.data import media
    from aha_tpu.streaming.multi import MultiStreamServer

    mesh = None
    if args.mesh_data * args.mesh_model > 1:
        from aha_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(args.mesh_data, args.mesh_model)

    session = _build_session(args)
    server = MultiStreamServer(
        session.engine.params, session.cfg, session.tokenizer, session.args,
        batch=args.batch, max_frames=args.max_frames,
        lora=session.engine.lora, lora_scale=session.engine.lora_scale,
        mesh=mesh)

    res = session.cfg.frame_resolution

    class RequestError(Exception):
        def __init__(self, key, cause):
            super().__init__(str(cause))
            self.key = key

    def decode_request(line):
        try:
            req = json.loads(line)
        except Exception as e:
            raise RequestError(None, e)
        key = req.get("key", req.get("video"))
        try:
            frames, _idx = media.decode_video(
                req["video"], output_fps=args.frame_fps, output_size=res,
                max_frames=args.max_frames)
            # per-stream trigger sensitivity (the reference's per-process
            # threshold, kept per-slot in the batched server)
            opts = {k: req[k] for k in ("stream_end_prob_threshold",
                                        "stream_end_score_sum_threshold",
                                        "threshold_z")
                    if k in req}
        except Exception as e:
            raise RequestError(key, e)
        return key, frames, req.get("conversation", []), opts

    # bounded decode-ahead: the pool keeps at most 2*workers requests in
    # flight so a long input backlog cannot exhaust host RAM with frames
    def read_lines(f):
        for line in f:
            line = line.strip()
            if line:
                yield line

    src = sys.stdin if args.input == "-" else open(args.input)
    out = sys.stdout if args.output == "-" else open(args.output, "w")
    pool = ThreadPoolExecutor(max_workers=args.decode_workers)
    pending: _queue.Queue = _queue.Queue()
    depth = threading.Semaphore(2 * args.decode_workers)
    DONE = object()

    def feed_pool():
        try:
            for line in read_lines(src):
                depth.acquire()        # block until a decode slot frees
                pending.put(pool.submit(decode_request, line))
        finally:
            # ALWAYS terminate the stream — a feeder exception (unreadable
            # input, bad encoding) must end the server, not hang it
            pending.put(DONE)

    feeder = threading.Thread(target=feed_pool, daemon=True)
    feeder.start()

    def requests():
        """Yield decoded requests; None while decode lags (run_items keeps
        serving occupied slots instead of stalling on the feeder). The
        head-of-queue future is held locally until done() so an in-flight
        decode never blocks the serving loop."""
        cur = None
        while True:
            if cur is None:
                try:
                    cur = pending.get_nowait()
                except _queue.Empty:
                    yield None
                    continue
            if cur is DONE:
                return
            if not cur.done():
                yield None             # decode still running — keep serving
                continue
            fut, cur = cur, None
            try:
                item = fut.result()
            except Exception as e:     # bad JSON / unreadable video: the
                # stream fails, the server does not (reference analog:
                # dataset retry fallback, datasets.py:333-363)
                depth.release()
                key = getattr(e, "key", None)
                out.write(json.dumps({"key": key, "error": str(e)}) + "\n")
                out.flush()
                continue
            depth.release()
            yield item

    def emit(key, result):
        rec = {"key": key, "responses": result["responses"]}
        if args.emit_scores:
            rec["debug_data"] = result["debug_data"]
        out.write(json.dumps(rec) + "\n")
        out.flush()

    stats: dict | None = {} if args.stats else None
    n = len(server.run_items(requests(), fps=args.frame_fps, on_result=emit,
                             stats=stats))
    pool.shutdown()
    if out is not sys.stdout:
        out.close()
    print(f"served {n} streams", file=sys.stderr)
    if stats is not None:
        print("phase split: " + json.dumps(
            {k: (round(v, 3) if isinstance(v, float) else v)
             for k, v in sorted(stats.items())}), file=sys.stderr)


COMMANDS = {
    "infer": cmd_infer,
    "grid-search": cmd_grid_search,
    "evaluate": cmd_evaluate,
    "highlight": cmd_highlight,
    "demo": cmd_demo,
    "train": cmd_train,
    "visualize": cmd_visualize,
    "serve": cmd_serve,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m aha_tpu.cli {" + ",".join(COMMANDS) + "} ...")
        return 0
    # persistent XLA compilation cache: the 3-stage eval pipelines spawn a
    # fresh process per stage and the 7B compile costs minutes each —
    # cache it once on disk (AHA_COMPILE_CACHE=0 to disable)
    from aha_tpu.utils.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command {cmd}; available: {', '.join(COMMANDS)}")
        return 2
    COMMANDS[cmd](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(main())

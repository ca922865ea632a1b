"""Shared CLI helpers: session construction + the common inference flag
set (mirrors `LiveTestArguments`, /root/reference/models/arguments_live.py:5-44)."""

from __future__ import annotations

import argparse
import os
import sys

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
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
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

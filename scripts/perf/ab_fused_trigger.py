"""One-process A/B: the BATCHED trigger loop (score_until_trigger_multi —
the serving scoring path, ref workload one-process-per-stream
`/root/reference/test/inference.py:857-908`) per-frame vs fused k frames
per weight stream (engine._trigger_loop_fused), and the fused serving
iteration (serve_step) under a trigger-sparse QA workload.

Three arms:
  1. trigger loop, no triggers (thresholds inf): the pure-scoring serving
     phase — the case fusion targets.
  2. trigger loop, sparse triggers (prob threshold hit a few times per
     stream): acceptance-gated commits + host round trips per event.
  3. MultiStreamSession.run on the same workload (the product serving
     loop end to end, trigger-sparse), k=1 vs k=4.

Usage: python scripts/perf/ab_fused_trigger.py [--preset 7b-int8]
       [--frames 48] [--batch 8] [--ks 4] [--reps 5]
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import jax
import numpy as np

import bench
from aha_tpu.streaming.engine import StreamEngine

HEADS = ("informative_score", "relevance_score")


def drive_trigger(eng, embeds, prob_thr, reps=5):
    """Repeated score_until_trigger_multi to completion (the serving
    pattern); returns median aggregate fps + per-rep values."""
    B, T = embeds.shape[:2]
    vals = []
    for _ in range(reps):
        cache = eng.new_cache()
        start = np.zeros(B, np.int32)
        limit = np.full(B, T, np.int32)
        ssum = np.zeros(B, np.float32)
        zs = eng.new_z_state()
        n_scored = 0
        t0 = time.perf_counter()
        while (start < limit).any():
            cache, sb, i2, s2, trig, zh, zc = eng.score_until_trigger_multi(
                cache, embeds, start, limit, ssum, prob_thr, None, HEADS,
                z_state=zs)
            zs = (zh, zc)
            i2h, ssum = jax.device_get((i2, s2))
            i2h = np.asarray(i2h, np.int32)
            n_scored += int((i2h - start).sum())
            start = i2h
            ssum = np.asarray(ssum, np.float32)
        vals.append(n_scored / (time.perf_counter() - t0))
    vals.sort()
    return vals[len(vals) // 2], vals


def drive_session(params, cfg, embeds, k, prob, reps=3):
    from aha_tpu.config import InferConfig
    from aha_tpu.streaming.multi import MultiStreamSession
    from aha_tpu.tokenization import build_stream_tokenizer

    B, T = embeds.shape[:2]
    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    icfg = InferConfig(stream_end_prob_threshold=prob, frame_fps=1.0,
                       kv_cache_policy="sink", kv_window=2048,
                       num_sink_tokens=32, max_new_tokens=8,
                       fused_score_frames=k)
    ms = MultiStreamSession(params, cfg, tok, icfg, batch=B)
    ms.engine.encode_frames = lambda v: v
    frames = [embeds[b] for b in range(B)]
    convs = [[{"role": "user", "content": f"what is in stream {b}?",
               "time": 0.0}] for b in range(B)]
    outs = ms.run(frames, convs, fps=1.0)          # warmup/compile
    n_resp = sum(len([r for r in o["responses"] if r["role"] == "assistant"])
                 for o in outs)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = ms.run(frames, convs, fps=1.0)
        n = sum(len(o["debug_data"]) for o in outs)
        vals.append(n / (time.perf_counter() - t0))
    vals.sort()
    return vals[len(vals) // 2], vals, n_resp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="7b-int8")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--ks", default="4")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    engine, cfg = bench.build(args.preset)
    r = cfg.frame_resolution
    T, B = args.frames, args.batch
    frames = np.random.default_rng(0).integers(0, 255, (T, r, r, 3),
                                               dtype=np.uint8)
    embeds = engine.encode_frames(frames)
    eb = jax.numpy.broadcast_to(embeds[None], (B, *embeds.shape))
    jax.device_get(eb[0, 0])

    # sparse-trigger threshold: fires on the top ~10% of frames (random
    # bench weights hover ~0.5+0.5; a real checkpoint is sparser still)
    probe = StreamEngine(engine.params, cfg, engine.policy, batch=B)
    c = probe.new_cache()
    _, s = probe.score_stream(c, eb)
    s = np.asarray(jax.device_get(s), np.float64)
    sparse_thr = float(np.quantile(s[..., 0] + s[..., 1], 0.9))
    del probe, c

    ks = [1] + [int(x) for x in args.ks.split(",") if x]
    base_none = base_sparse = None
    for k in ks:
        eng = StreamEngine(engine.params, cfg, engine.policy, batch=B,
                           fused_score_frames=k)
        # warm both shapes
        drive_trigger(eng, eb, np.inf, reps=1)
        med_none, v_none = drive_trigger(eng, eb, np.inf, reps=args.reps)
        drive_trigger(eng, eb, sparse_thr, reps=1)
        med_sp, v_sp = drive_trigger(eng, eb, sparse_thr, reps=args.reps)
        if k == 1:
            base_none, base_sparse = med_none, med_sp
        print(f"trigger-loop[k={k}] no-trigger: {med_none:.1f} agg fps "
              f"({med_none / base_none:.2f}x)  {['%.1f' % v for v in v_none]}",
              flush=True)
        print(f"trigger-loop[k={k}] sparse-trigger(thr={sparse_thr:.3f}): "
              f"{med_sp:.1f} agg fps ({med_sp / base_sparse:.2f}x)  "
              f"{['%.1f' % v for v in v_sp]}", flush=True)
        del eng

    base_qa = None
    for k in ks:
        med, vals, n_resp = drive_session(engine.params, cfg, eb, k,
                                          sparse_thr, reps=3)
        if k == 1:
            base_qa = med
        print(f"serving-session[k={k}] sparse QA: {med:.1f} agg fps "
              f"({med / base_qa:.2f}x, {n_resp} responses)  "
              f"{['%.1f' % v for v in vals]}", flush=True)


if __name__ == "__main__":
    main()

"""One-process A/B: 7B frame-scan throughput, per-frame scan vs fused
multi-frame scoring (k frames verified per weight stream,
engine.score_stream_fused). Also checks on-chip score parity between the
two paths and measures the batched (B=8) variant, where the pass is
compute-rich and the expected win is smaller.

Usage: python scripts/perf/ab_fused_scoring.py [--preset 7b-int8]
       [--frames 64] [--ks 2,4,8] [--batch8]
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

def scan_fps(engine, embeds, n_frames, reps=5):
    vals = []
    for _ in range(reps):
        c = engine.new_cache()
        t0 = time.perf_counter()
        _, s = engine.score_stream(c, embeds)
        s = jax.device_get(s)
        vals.append(n_frames * embeds.shape[0] / (time.perf_counter() - t0))
    vals.sort()
    return vals[len(vals) // 2], vals, s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="7b-int8")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--ks", default="2,4,8")
    ap.add_argument("--batch8", action="store_true",
                    help="also run the B=8 batched variant")
    args = ap.parse_args()

    engine, cfg = bench.build(args.preset)
    r = cfg.frame_resolution
    T = args.frames
    frames = np.random.default_rng(0).integers(0, 255, (T, r, r, 3),
                                               dtype=np.uint8)
    embeds = engine.encode_frames(frames)
    jax.device_get(embeds[0, 0])

    batches = [("B=1", embeds[None])]
    if args.batch8:
        eb = jax.numpy.broadcast_to(embeds[None], (8, *embeds.shape))
        batches.append(("B=8", eb))

    for label, eb in batches:
        B = eb.shape[0]
        base = StreamEngine(engine.params, cfg, engine.policy, batch=B)
        c = base.new_cache()
        _, s0 = base.score_stream(c, eb)      # warm at timed shape
        jax.device_get(s0)
        med, vals, s_base = scan_fps(base, eb, T)
        print(f"{label} scan[k=1]: median {med:.1f} fps  "
              f"{['%.1f' % v for v in vals]}", flush=True)
        for k in [int(x) for x in args.ks.split(",") if x]:
            eng = StreamEngine(engine.params, cfg, engine.policy, batch=B,
                               fused_score_frames=k)
            c = eng.new_cache()
            _, s = eng.score_stream(c, eb)    # warm (compiles both branches)
            jax.device_get(s)
            med_k, vals_k, s_fused = scan_fps(eng, eb, T)
            err = float(np.max(np.abs(np.asarray(s_fused, np.float64)
                                      - np.asarray(s_base, np.float64))))
            print(f"{label} scan[k={k}]: median {med_k:.1f} fps "
                  f"({med_k / med:.2f}x)  {['%.1f' % v for v in vals_k]}  "
                  f"max|score diff|={err:.2e}", flush=True)


if __name__ == "__main__":
    main()

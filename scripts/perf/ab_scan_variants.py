"""One-process A/B: 7B decoder-scan throughput across serving variants.

Variants: quant-matmul backend (auto / w8a8 / fused_a8) x KV-cache dtype
(bf16 / int8), plus multi-stream aggregate scaling (B = 8 / 16 / 32).
All comparisons run inside one process — the axon tunnel's run-to-run
variance makes cross-process single numbers meaningless (BASELINE.md).

Run on the TPU:  python scripts/perf/ab_scan_variants.py
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax
import jax.numpy as jnp

import bench
from aha_tpu.ops import quant
from aha_tpu.streaming.engine import StreamEngine

BENCH_FRAMES = 64


def scan_fps(engine, embeds, n_frames, reps=5):
    c = engine.new_cache()
    _, s = engine.score_stream(c, embeds)      # warm at timed shape
    jax.device_get(s)
    vals = []
    for _ in range(reps):
        c = engine.new_cache()
        t0 = time.perf_counter()
        _, s = engine.score_stream(c, embeds)
        jax.device_get(s)
        vals.append(n_frames / (time.perf_counter() - t0))
    vals.sort()
    return vals[len(vals) // 2], vals


def main():
    engine, cfg = bench.build("7b-int8")
    r = cfg.frame_resolution
    frames = np.random.default_rng(0).integers(
        0, 255, (BENCH_FRAMES, r, r, 3), dtype=np.uint8)
    embeds = engine.encode_frames(frames)
    jax.device_get(embeds[0, 0, 0])
    params, policy = engine.params, engine.policy
    del engine

    import os

    print("== single-stream scan (64 frames) ==", flush=True)
    results = {}
    single = () if os.environ.get("AHA_AB_MULTI_ONLY") else (
        ("auto", None), ("auto", jnp.int8),
        ("w8a8", None), ("w8a8", jnp.int8),
        ("fused_a8", None))
    for backend, kvd in single:
        quant._FORCE_BACKEND = backend
        eng = StreamEngine(params, cfg, policy, kv_dtype=kvd)
        med, vals = scan_fps(eng, embeds[None], BENCH_FRAMES)
        tag = f"{backend}/kv={'int8' if kvd else 'bf16'}"
        results[tag] = med
        print(f"scan[{tag}]: median {med:.1f} fps  "
              f"{['%.1f' % v for v in vals]}", flush=True)
        del eng

    print("== multi-stream aggregate (16 frames/stream) ==", flush=True)
    mb = 16
    # int8-KV last at each batch size: B=32 with bf16 KV OOMs the 16 GB chip
    # (3.7 GB cache on top of 7 GB weights) and a failed compile can poison
    # the allocator for subsequent variants
    for backend, kvd in (("w8a8", None), ("w8a8", jnp.int8), ("auto", None),
                         ("auto", jnp.int8)):
        quant._FORCE_BACKEND = backend
        jax.clear_caches()
        for B in (8, 16, 32):
            try:
                eng = StreamEngine(params, cfg, policy, batch=B, kv_dtype=kvd)
                stacked = jnp.broadcast_to(
                    embeds[None, :mb], (B, mb, *embeds.shape[1:]))
                med, vals = scan_fps(eng, stacked, B * mb, reps=3)
                tag = f"{backend}/kv={'int8' if kvd else 'bf16'}/B={B}"
                results[tag] = med
                print(f"multi[{tag}]: median {med:.1f} fps aggregate "
                      f"({med / B:.1f}/stream)  {['%.1f' % v for v in vals]}",
                      flush=True)
                del eng, stacked
            except Exception as e:  # OOM at large B is a result, not a crash
                print(f"multi[{backend}/B={B}]: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                break
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()

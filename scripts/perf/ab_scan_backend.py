"""One-process A/B: 7B frame-scan throughput, fused Pallas vs jnp quant
backend (the only reliable comparison on the variance-heavy axon tunnel)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax

import bench
from aha_tpu.ops import quant

BENCH_FRAMES = 64


def scan_fps(engine, embeds, reps=5):
    vals = []
    for _ in range(reps):
        c = engine.new_cache()
        t0 = time.perf_counter()
        _, s = engine.score_stream(c, embeds[None])
        jax.device_get(s)
        vals.append(BENCH_FRAMES / (time.perf_counter() - t0))
    vals.sort()
    return vals[len(vals) // 2], vals


def main():
    engine, cfg = bench.build("7b-int8")   # built under the default backend
    r = cfg.frame_resolution
    frames = np.random.default_rng(0).integers(0, 255, (BENCH_FRAMES, r, r, 3),
                                               dtype=np.uint8)
    embeds = engine.encode_frames(frames)
    jax.device_get(embeds[0, 0, 0])

    from aha_tpu.ops.kv_cache import CachePolicy
    from aha_tpu.streaming.engine import StreamEngine

    results = {}
    for backend in ("auto", "jnp", "fused_a8"):
        quant._FORCE_BACKEND = backend
        eng = StreamEngine(engine.params, cfg, engine.policy)
        c = eng.new_cache()
        _, s = eng.score_stream(c, embeds[None])   # warm at timed shape
        jax.device_get(s)
        med, vals = scan_fps(eng, embeds)
        results[backend] = med
        print(f"scan[{backend}]: median {med:.1f} fps  {['%.1f' % v for v in vals]}",
              flush=True)
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()

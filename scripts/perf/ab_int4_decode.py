"""A/B: batched greedy decode throughput, int8 vs int4 trunk (7B, real chip).

Motivation (BASELINE.md round 3): generation dominates the QA serving
workload and batched decode runs at ~111 tok/s with the int8 trunk — right
at the 7.3 GB/pass weight-DMA roofline (7.3 GB / 819 GB/s ~ 8.9 ms/token).
Decode has arithmetic intensity ~1, so the packed-int4 trunk (3.9 GB of
trunk weights) could nearly double it IF the fused Pallas unpack-matmul's
custom-call serialization costs less than the DMA it saves (training
measured 2.1x SLOWER for int4 — but training overlaps XLA work that decode,
a sequential layer chain, does not have).

Run ON THE CHIP (one TPU process at a time):
    python scripts/perf/ab_int4_decode.py [--b 8] [--tokens 64]

Prints one JSON line per variant: {"variant", "tok_s", "ms_per_token", ...}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def run(preset: str, B: int, max_new: int) -> dict:
    import jax

    import bench

    engine, cfg = bench.build(preset)
    # rebuild at batch B with a bounded decode loop
    from aha_tpu.streaming.engine import StreamEngine

    eng = StreamEngine(engine.params, cfg, engine.policy, batch=B,
                       max_new_tokens=max_new)
    prompts = [list(range(1, 17)) for _ in range(B)]

    def once():
        cache = eng.new_cache()
        t0 = time.perf_counter()
        _, _ids, out_len, _, _ = eng.generate(cache, prompts,
                                              eng.new_rep_counts())
        n = int(jax.device_get(out_len).sum())
        return n, time.perf_counter() - t0

    once()                      # compile
    once()                      # warm
    best = None
    for _ in range(5):
        n, dt = once()
        r = dict(variant=preset, batch=B, tokens=n, wall_s=round(dt, 3),
                 tok_s=round(n / dt, 1),
                 ms_per_token_per_row=round(dt / max(n / B, 1) * 1000, 2))
        if best is None or r["tok_s"] > best["tok_s"]:
            best = r
    return best


def main():
    B = int(sys.argv[sys.argv.index("--b") + 1]) if "--b" in sys.argv else 8
    max_new = (int(sys.argv[sys.argv.index("--tokens") + 1])
               if "--tokens" in sys.argv else 64)
    presets = ("7b-int8", "7b-int4")
    if "--presets" in sys.argv:
        presets = tuple(sys.argv[sys.argv.index("--presets") + 1].split(","))
    for preset in presets:
        r = run(preset, B, max_new)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()

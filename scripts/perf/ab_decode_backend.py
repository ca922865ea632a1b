"""A/B: batched greedy decode across quantized-matmul backends (7B int8).

Motivation (BASELINE.md round 3): the fused batched decode pass measures
19.7 ms at B=8 — 16.1 GB of HBM traffic at 819 GB/s, i.e. ~2x the 7.6 GB
of int8 weight bytes. Hypothesis: the `auto` backend's dequantize-then-
einsum materializes a bf16 weight copy per matmul at decode widths (read
int8 + write bf16 + read bf16 = 2.9x the bytes; at scan widths XLA fuses
the convert into the dot and the same backend wins). If so, `w8a8`
(int8 x int8 straight into the MXU, weights never leave int8) or the
fused Pallas kernels should approach the 9.3 ms weight-DMA roofline and
nearly double serving decode throughput.

Run ON THE CHIP (one TPU process at a time):
    python scripts/perf/ab_decode_backend.py [--b 8] [--tokens 64]

Prints one JSON line per backend: {"backend", "tok_s", "ms_per_pass"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

BACKENDS = ("auto", "w8a8", "fused", "fused_a8")


def main():
    global BACKENDS
    B = int(sys.argv[sys.argv.index("--b") + 1]) if "--b" in sys.argv else 8
    max_new = (int(sys.argv[sys.argv.index("--tokens") + 1])
               if "--tokens" in sys.argv else 64)
    if "--backends" in sys.argv:
        BACKENDS = tuple(
            sys.argv[sys.argv.index("--backends") + 1].split(","))

    import jax

    preset = "7b-int8"
    if "--tiny" in sys.argv:               # CPU sanity run
        jax.config.update("jax_platforms", "cpu")
        preset = "tiny"

    import bench
    from aha_tpu.streaming.engine import StreamEngine

    engine, cfg = bench.build(preset)      # one param build, shared
    if preset == "tiny":                   # tiny builds dense params; the
        from aha_tpu.ops.quant import quantize_params  # backends need int8

        engine = StreamEngine(quantize_params(engine.params), cfg,
                              engine.policy)
    prompts = [list(range(1, 17))] * B

    for backend in BACKENDS:
        os.environ["AHA_QUANT_MATMUL"] = backend
        # fresh engine => fresh traces; backend is read at trace time
        eng = StreamEngine(engine.params, cfg, engine.policy, batch=B,
                           max_new_tokens=max_new)

        def once():
            cache = eng.new_cache()
            t0 = time.perf_counter()
            _, _ids, out_len, _, _ = eng.generate(cache, prompts,
                                                  eng.new_rep_counts())
            n = int(jax.device_get(out_len).sum())
            return n, time.perf_counter() - t0

        try:
            once()                      # compile
            once()                      # warm
            best = None
            for _ in range(5):
                n, dt = once()
                r = dict(backend=backend, batch=B, tokens=n,
                         wall_s=round(dt, 3), tok_s=round(n / dt, 1),
                         ms_per_pass=round(dt / max(n / B, 1) * 1000, 2))
                if best is None or r["tok_s"] > best["tok_s"]:
                    best = r
            print(json.dumps(best), flush=True)
        except Exception as e:  # OOM / lowering failure: report, continue
            print(json.dumps(dict(backend=backend,
                                  error=f"{type(e).__name__}: {e}"[:200])),
                  flush=True)
        del eng


if __name__ == "__main__":
    main()

"""In-process A/B: fixed lockstep groups (MultiStreamSession) vs continuous
batching (MultiStreamServer) on ragged stream lengths, real chip.

7B int8, 8 slots, 16 streams with lengths ~ uniform(30, 150) frames
(both group maxima pinned to 150 so each side compiles exactly one frame
shape and the A/B measures scheduling, not compile counts). Vision encode
is bypassed (identity on precomputed random embeds) so the comparison
isolates the serving schedule: lockstep runs T_max(group) steps per group
at full batch cost while finished rows idle; the server refills a slot the
moment its stream retires. Triggers are disabled via an unreachable sum
threshold so both sides do pure scoring through the same machinery.

Run on the TPU: python scripts/perf/ab_continuous_batching.py
(One TPU process at a time.)

Measured 2026-08-17, v5e-1 via axon tunnel, device-resident streams
(1599 frames): server 282 batch iterations vs lockstep 300, both at
~60 ms/iteration of device time (the batched trigger loop runs at scan
speed — see BASELINE.md "Serving scheduler"). NOTE the workload pins both
group maxima to T_CAP so lockstep compiles once — that also makes
lockstep near-optimal on iterations; its real-world costs (per-group-
length recompiles, whole group idling behind its longest stream) don't
show here. Wall-clock on this tunnel is dominated by ~40 ms-per-dispatch
RTT (the server intentionally returns per retirement to refill slots),
so iteration counts are the robust comparison.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from aha_tpu.config import InferConfig
from aha_tpu.streaming.multi import MultiStreamServer, MultiStreamSession
from aha_tpu.tokenization import build_stream_tokenizer

B = 8
N_STREAMS = 16
T_CAP = 150


def main():
    print("device:", jax.devices()[0], flush=True)
    engine, cfg = bench.build("7b-int8")
    params = engine.params
    tokenizer = build_stream_tokenizer(
        frame_num_tokens=cfg.frame_num_tokens, vocab_size=cfg.llm.vocab_size)

    rng = np.random.default_rng(0)
    lengths = rng.integers(30, 151, N_STREAMS)
    lengths[B - 1] = lengths[-1] = T_CAP     # pin both group maxima
    F, H = cfg.frame_num_tokens, cfg.llm.hidden_size
    # place embeds on device ONCE, before timing: the axon tunnel moves
    # host->device data at ~17 MB/s, so host-resident streams would make
    # both sides measure the tunnel (1.7 GB here), not the scheduler
    embeds = [jnp.asarray(
        (0.02 * rng.standard_normal((int(n), F, H))).astype(np.float32),
        jnp.bfloat16) for n in lengths]
    jax.block_until_ready(embeds)
    total = int(lengths.sum())
    print("lengths:", lengths.tolist(), "total frames:", total, flush=True)

    def icfg():
        return InferConfig(
            frame_fps=1.0, frame_resolution=cfg.frame_resolution,
            stream_end_score_sum_threshold=1e9,   # never fires
            kv_cache_policy="sink", kv_window=2048, num_sink_tokens=32,
            max_new_tokens=8, remove_assistant_turns=True,
        )

    conv = [{"role": "user", "content": "what is happening?", "time": 0}]
    results = {}

    # --- continuous batching ------------------------------------------------
    server = MultiStreamServer(params, cfg, tokenizer, icfg(), batch=B,
                               max_frames=T_CAP)
    server.engine.encode_frames = lambda v: jnp.asarray(v)   # identity
    items = [(j, embeds[j], conv) for j in range(N_STREAMS)]
    server.run_items([(f"w{j}", embeds[0][:4], conv) for j in range(2)],
                     fps=1.0)                                # compile warmup
    t0 = time.time()
    out = server.run_items(items, fps=1.0)
    wall = time.time() - t0
    assert all(len(out[j]["debug_data"]) == lengths[j] for j in range(N_STREAMS))
    results["server"] = {"wall_s": round(wall, 2),
                         "aggregate_fps": round(total / wall, 1)}
    print(json.dumps({"server": results["server"]}), flush=True)

    # --- fixed lockstep groups (driver behavior before the server) ----------
    ms = MultiStreamSession(params, cfg, tokenizer, icfg(), batch=B,
                            engine=server.engine)   # share the engine
    groups = [list(range(0, B)), list(range(B, N_STREAMS))]

    def run_group(g):
        return ms.run([embeds[j] for j in g], [conv] * len(g), fps=1.0)

    run_group(groups[0])                                     # compile warmup
    t0 = time.time()
    for g in groups:
        out = run_group(g)
        for j, row in zip(g, out):
            assert len(row["debug_data"]) == lengths[j]
    wall = time.time() - t0
    results["lockstep"] = {"wall_s": round(wall, 2),
                           "aggregate_fps": round(total / wall, 1)}
    results["speedup"] = round(results["lockstep"]["wall_s"] /
                               results["server"]["wall_s"], 2)
    with open("/tmp/ab_cb_result.json", "w") as f:
        json.dump(results, f, indent=1)
    print("DONE", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

"""A/B: serving-loop generation overlap (AHA_SERVE_OVERLAP) on a ragged-
trigger workload.

The bench QA metric fires every row's trigger on every frame (random
weights score ~1.0 vs the 0.55 threshold), so generation is already fully
batched there and overlap cannot show its win. Real MAGQA-shaped traffic
is ragged: one stream answers while the others keep streaming. This
harness builds that shape with per-row thresholds (one row fires per
frame, the rest never fire) and measures aggregate fps with the mixed
loop (overlap on, default) vs freeze-then-generate (off).

Expected on the v5e-1 7B: with overlap OFF, each of row 0's decode passes
streams all 7.3 GB of weights while rows 1..7 idle; ON, the same passes
carry their frame scoring. Run ON THE CHIP:

    python scripts/perf/ab_serve_overlap.py [--b 8] [--frames 48]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_session(overlap: bool, preset: str, B: int, T: int):
    os.environ["AHA_SERVE_OVERLAP"] = "1" if overlap else "0"
    import jax
    import jax.numpy as jnp

    import bench
    from aha_tpu.config import InferConfig
    from aha_tpu.streaming.multi import MultiStreamSession
    from aha_tpu.tokenization import build_stream_tokenizer

    engine, cfg = bench.build(preset)
    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    icfg = InferConfig(stream_end_prob_threshold=0.55, frame_fps=1.0,
                       kv_cache_policy="sink", kv_window=2048,
                       num_sink_tokens=32, max_new_tokens=32)
    sess = MultiStreamSession(engine.params, cfg, tok, icfg, batch=B)
    sess.engine.encode_frames = lambda v: v     # pre-encoded embeds below
    H = cfg.llm.hidden_size
    F = cfg.frame_num_tokens
    emb = jnp.asarray(
        0.05 * np.random.default_rng(0).standard_normal((T, F, H)),
        jnp.dtype(cfg.dtype))
    frames = [emb] * B
    convs = [[{"role": "user", "content": f"stream {i}?", "time": 0.0}]
             for i in range(B)]
    return sess, frames, convs


def run(overlap: bool, preset: str, B: int, T: int) -> dict:
    sess, frames, convs = build_session(overlap, preset, B, T)
    # ragged triggers via per-item overrides (admission resets the per-row
    # thresholds, so they must ride the items): ONLY stream 0 responds
    mute = {"stream_end_prob_threshold": 1e30}
    items = [(b, frames[b], convs[b], None if b == 0 else mute)
             for b in range(B)]

    def go():
        return sess.run_items(list(items), fps=1.0,
                              max_frames=frames[0].shape[0])

    go()                                    # warmup/compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        res = go()
        dt = time.perf_counter() - t0
        outs = [res[b] for b in range(B)]
        n_frames = sum(len(o["debug_data"]) for o in outs)
        n_resp = sum(len([t for t in o["responses"]
                          if t["role"] == "assistant"]) for o in outs)
        r = dict(overlap=overlap, frames=n_frames, responses=n_resp,
                 wall_s=round(dt, 3), agg_fps=round(n_frames / dt, 2))
        if best is None or r["agg_fps"] > best["agg_fps"]:
            best = r
    return best


def main():
    B = int(sys.argv[sys.argv.index("--b") + 1]) if "--b" in sys.argv else 8
    T = (int(sys.argv[sys.argv.index("--frames") + 1])
         if "--frames" in sys.argv else 48)
    preset = "tiny" if "--tiny" in sys.argv else "7b-int8"
    if preset == "tiny":
        import jax

        jax.config.update("jax_platforms", "cpu")
    for overlap in (True, False):
        print(json.dumps(run(overlap, preset, B, T)), flush=True)


if __name__ == "__main__":
    main()

"""A/B: speculative decode tail inside the fused serving loop.

The mixed loop's pure-decode tail (every live row decoding — the body of
a response round) switches to S-token verify chunks at
AHA_SPEC_DECODE>1 (engine spec_tail). This harness measures the
multi-stream QA workload (every row triggers every frame, the bench
`multi_stream_qa_8x` shape) across:

  * seq        — AHA_SPEC_DECODE=1, the sequential width-1 tail.
  * spec4      — S=4, real n-gram drafter on the model's actual greedy
                 output (random weights: mostly rejected — measures the
                 verify-pass price inside the serving program).
  * seq_rep / spec4_rep — same arms with the lm_head zeroed (argmax =
                 token 0 always): after the first token the drafter
                 proposes the repeated token and every chunk commits at
                 full width — the full-acceptance CEILING of the serving
                 loop (real-checkpoint acceptance lands between the
                 arms; MAGQA-style answers that quote context sit near
                 the ceiling).

Run ON THE CHIP (one TPU process at a time):
    python scripts/perf/ab_spec_serve.py [--b 8] [--frames 24]
Prints one JSON line per arm.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


from scripts.perf.perf_utils import zero_lm_head as zero_head  # noqa: E402


def run(params, cfg, arm: str, S: int, B: int, T: int) -> dict:
    os.environ["AHA_SPEC_DECODE"] = str(S)
    import jax.numpy as jnp

    from aha_tpu.config import InferConfig
    from aha_tpu.streaming.multi import MultiStreamSession
    from aha_tpu.tokenization import build_stream_tokenizer

    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    icfg = InferConfig(stream_end_prob_threshold=0.55, frame_fps=1.0,
                       kv_cache_policy="sink", kv_window=2048,
                       num_sink_tokens=32, max_new_tokens=32)
    sess = MultiStreamSession(params, cfg, tok, icfg, batch=B)
    sess.engine.encode_frames = lambda v: v      # pre-encoded embeds
    H = cfg.llm.hidden_size
    F = cfg.frame_num_tokens
    emb = jnp.asarray(
        0.05 * np.random.default_rng(0).standard_normal((T, F, H)),
        jnp.dtype(cfg.dtype))
    frames = [emb] * B
    convs = [[{"role": "user", "content": f"stream {i}?", "time": 0.0}]
             for i in range(B)]

    def go():
        return sess.run(frames, convs, fps=1.0)

    go()                                         # warmup/compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        res = go()
        dt = time.perf_counter() - t0
        n_frames = sum(len(res[b]["debug_data"]) for b in range(B))
        n_resp = sum(len([t for t in res[b]["responses"]
                          if t["role"] == "assistant"]) for b in range(B))
        r = dict(arm=arm, frames=n_frames, responses=n_resp,
                 wall_s=round(dt, 3), agg_fps=round(n_frames / dt, 2))
        if best is None or r["agg_fps"] > best["agg_fps"]:
            best = r
    return best


def main():
    B = int(sys.argv[sys.argv.index("--b") + 1]) if "--b" in sys.argv else 8
    T = (int(sys.argv[sys.argv.index("--frames") + 1])
         if "--frames" in sys.argv else 24)
    preset = "tiny" if "--tiny" in sys.argv else "7b-int8"
    if preset == "tiny":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import bench

    engine, cfg = bench.build(preset)
    params = engine.params
    del engine
    print(json.dumps(run(params, cfg, "seq", 1, B, T)), flush=True)
    print(json.dumps(run(params, cfg, "spec4", 4, B, T)), flush=True)
    zp = zero_head(params)
    print(json.dumps(run(zp, cfg, "seq_rep", 1, B, T)), flush=True)
    print(json.dumps(run(zp, cfg, "spec4_rep", 4, B, T)), flush=True)


if __name__ == "__main__":
    main()

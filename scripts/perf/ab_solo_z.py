"""A/B: solo threshold_z sessions — stepwise host rule vs the on-device
B=1 batched trigger loop.

Until round 4, `StreamSession.inference()` fell back to the per-frame
stepwise loop whenever threshold_z was set (the z running-list lived on
the host), paying one ~40 ms tunnel sync per frame. The z window now
lives on device (engine.z_step via score_until_trigger_multi), so a z
session scores at the fused trigger-loop rate. Outputs are
parity-tested
(tests/test_streaming.py::test_chunked_inference_threshold_z_matches_stepwise);
this harness measures the rate on the chip.

Arms (each at T frames, 7B int8, sink cache W=2048/32):

  * step_scan  — chunked=False, z_thr=99 (never fires): the pure
                 per-frame scoring rate the old path paid.
  * dev_scan   — chunked=True, same rule: the on-device z loop.
  * step_resp / dev_resp — z_thr tuned to actually fire (generation in
                 the loop), both paths end-to-end.

Run ON THE CHIP (one TPU process at a time):
    python scripts/perf/ab_solo_z.py [--frames 128] [--tiny]
Prints one JSON line per arm.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def run(params, cfg, arm: str, chunked: bool, z_thr: float, T: int) -> dict:
    import jax.numpy as jnp

    from aha_tpu.config import InferConfig
    from aha_tpu.streaming.session import build_session
    from aha_tpu.tokenization import build_stream_tokenizer

    tok = build_stream_tokenizer(frame_num_tokens=cfg.frame_num_tokens,
                                 vocab_size=cfg.llm.vocab_size)
    icfg = InferConfig(frame_fps=1.0,
                       stream_end_prob_threshold=None,
                       stream_end_score_sum_threshold=None,
                       threshold_z=z_thr, first_n_frames_no_generate=3,
                       running_list_length=20,
                       kv_cache_policy="sink", kv_window=2048,
                       num_sink_tokens=32, max_new_tokens=16)
    H = cfg.llm.hidden_size
    F = cfg.frame_num_tokens
    emb = jnp.asarray(
        0.05 * np.random.default_rng(0).standard_normal((T, F, H)),
        jnp.dtype(cfg.dtype))

    # ONE session per arm: jitted engine functions are per-instance, so a
    # fresh build_session inside the timed loop would pay full retrace +
    # XLA compile every repetition (there is no persistent compilation
    # cache on this path) and the reported fps would measure the compiler,
    # not scoring. reset() + re-push per rep instead — the pattern
    # ab_fused_trigger.py uses; only the warmup call compiles.
    sess = build_session(params, cfg, tok, icfg)
    sess.engine.encode_frames = lambda v: v       # pre-encoded embeds

    def go():
        sess.reset()
        sess.input_video_stream(emb)
        sess.input_query_stream(
            [{"role": "user", "content": "watch the stream", "time": 0.0}])
        out = sess.inference(chunked=chunked)
        return out, len(sess.debug_data_list)

    go()                                          # warmup/compile
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        out, n_frames = go()
        dt = time.perf_counter() - t0
        n_resp = len([t for t in out if t["role"] == "assistant"])
        r = dict(arm=arm, frames=n_frames, responses=n_resp,
                 wall_s=round(dt, 3), fps=round(n_frames / dt, 2))
        if best is None or r["fps"] > best["fps"]:
            best = r
    return best


def main():
    T = (int(sys.argv[sys.argv.index("--frames") + 1])
         if "--frames" in sys.argv else 128)
    preset = "tiny" if "--tiny" in sys.argv else "7b-int8"
    if preset == "tiny":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import bench

    engine, cfg = bench.build(preset)
    params = engine.params
    del engine
    # z_thr for the firing arms: random weights give near-stationary
    # scores, so a low threshold fires regularly in both loops
    print(json.dumps(run(params, cfg, "step_scan", False, 99.0, T)),
          flush=True)
    print(json.dumps(run(params, cfg, "dev_scan", True, 99.0, T)),
          flush=True)
    print(json.dumps(run(params, cfg, "step_resp", False, 1.0, T)),
          flush=True)
    print(json.dumps(run(params, cfg, "dev_resp", True, 1.0, T)),
          flush=True)


if __name__ == "__main__":
    main()

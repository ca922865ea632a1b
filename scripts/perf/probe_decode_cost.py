"""Probe: XLA's own cost analysis of ONE batched decode pass (7B int8).

Motivation (BASELINE.md round 3): the B=8 batched decode pass runs at
~19.0 ms while the known data movement is ~8.3 GB (7.3 GB int8 trunk
weights + ~1 GB KV window) = ~10 ms at the 819 GB/s HBM roofline. The
in-situ knockouts (AHA_ABL) could not separate the remaining ~7 ms.
This asks the compiler instead: lower + compile ONE width-1 decode_chunk
+ lm_head at serving shapes and print `cost_analysis()` /
`memory_analysis()` — bytes accessed, output bytes, and the biggest
per-op traffic if available. If XLA reports ~2x the expected bytes, some
buffer is being double-moved (layout copy, dequant materialization);
if it reports ~8 GB, the pass is latency/scheduling-bound, not
bandwidth-starved, and further ms must come from algorithmic change.

Run ON THE CHIP: python scripts/perf/probe_decode_cost.py [--b 8]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from aha_tpu.models import qwen2

    B = int(sys.argv[sys.argv.index("--b") + 1]) if "--b" in sys.argv else 8

    engine, cfg = bench.build("7b-int8")
    from aha_tpu.streaming.engine import StreamEngine

    eng = StreamEngine(engine.params, cfg, engine.policy, batch=B,
                       max_new_tokens=8)
    cache = eng.new_cache()
    params = eng.params
    llm_cfg = cfg.llm

    def one_pass(params, cache, tok):
        emb = qwen2.embed_tokens(params["llm"], tok,
                                 dtype=jnp.dtype(cfg.dtype))[:, None, :]
        valid = jnp.ones((B,), jnp.int32)
        hidden, cache = qwen2.decode_chunk(
            params["llm"], llm_cfg, eng.policy, cache, emb, valid)
        logits = qwen2.lm_logits(params["llm"], llm_cfg, hidden[:, 0])
        return cache, jnp.argmax(logits, axis=-1).astype(jnp.int32)

    tok = jnp.zeros((B,), jnp.int32)
    lowered = jax.jit(one_pass, donate_argnums=(1,)).lower(params, cache, tok)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    keys = ("bytes accessed", "bytes accessed output", "flops",
            "optimal_seconds", "utilization operand 0 {}")
    out = {k: ca[k] for k in ca if "bytes" in k or k in ("flops",)}
    # top bytes-accessed entries of any kind
    big = sorted(((k, v) for k, v in ca.items()
                  if isinstance(v, (int, float)) and v > 1e8),
                 key=lambda kv: -kv[1])[:20]
    print(json.dumps({"batch": B,
                      "bytes_accessed_GB": round(ca.get("bytes accessed", 0) / 1e9, 2),
                      "flops_G": round(ca.get("flops", 0) / 1e9, 1),
                      "big_entries": [(k, round(v / 1e9, 2)) for k, v in big]},
                     indent=1))
    try:
        ma = compiled.memory_analysis()
        print(json.dumps({
            "argument_size_GB": round(ma.argument_size_in_bytes / 1e9, 2),
            "output_size_GB": round(ma.output_size_in_bytes / 1e9, 2),
            "temp_size_GB": round(ma.temp_size_in_bytes / 1e9, 2),
            "alias_size_GB": round(ma.alias_size_in_bytes / 1e9, 2),
        }, indent=1))
    except Exception as e:  # noqa: BLE001 - memory_analysis availability varies
        print("memory_analysis unavailable:", e)


if __name__ == "__main__":
    main()

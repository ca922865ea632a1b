"""Decompose the 7B multi-stream frame step: where does the time go?

Slope-times (in-jit loops) the isolated components of one decode_chunk at
batch B: the full chunk, cached_attention alone, the KV scatter write
alone, and the stacked-weight matmul chain alone. Run on the TPU:

    python scripts/perf/ab_step_decomposition.py [B] [--s S]

--s 1 decomposes the batched *decode* pass (generation width) instead of
the frame-chunk width; motivated by the round-3 decode-backend A/B where
auto == w8a8 at 19.5 ms/pass (B=8) — i.e. the 2x-over-roofline cost is
NOT weight-byte streaming, so find out what it is.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import dataclasses
import numpy as np
import jax, jax.numpy as jnp

import bench
from aha_tpu.ops import attention, quant
from aha_tpu.ops.kv_cache import CachePolicy, init_cache, plan_update, write_layer
from aha_tpu.models import qwen2

S = 56
if "--s" in sys.argv:
    i = sys.argv.index("--s")
    S = int(sys.argv[i + 1])
    del sys.argv[i:i + 2]


def slope(fn, args, n1=4, n2=16, reps=4):
    def mk(n):
        @jax.jit
        def loop(args, n_=n):
            def body(i, a):
                out = fn(*a)
                leaf = jax.tree_util.tree_leaves(out)[0]
                eps = (leaf.mean() * 1e-6).astype(a[0].dtype)
                return (a[0] + eps, *a[1:])
            return jax.lax.fori_loop(0, n_, body, args)[0]
        return loop
    l1, l2 = mk(n1), mk(n2)
    ts = ([], [])
    for l, t in ((l1, ts[0]), (l2, ts[1])):
        jax.device_get(l(args))
        for _ in range(reps):
            t0 = time.perf_counter(); jax.device_get(l(args))
            t.append(time.perf_counter() - t0)
    return (min(ts[1]) - min(ts[0])) / (n2 - n1) * 1e3


def main(B):
    engine, cfg = bench.build("7b-int8")
    llm = cfg.llm
    params = engine.params["llm"]
    policy = engine.policy
    del engine
    quant._FORCE_BACKEND = "w8a8"

    cache = init_cache(policy, num_layers=llm.num_layers, batch=B,
                       num_kv_heads=llm.num_kv_heads, head_dim=llm.head_dim,
                       dtype=jnp.bfloat16)
    # Steady-state cache AFTER the fill transient: ring slots must satisfy
    # the pre-rotation invariant rho = order - key_pos == D = seen - q_pos
    # drift, else cached_attention's runtime cond takes the exact branch
    # (whole-cache f32 rotation per layer) and the measurement reads ~10x
    # the production fast path. (The first version of this harness set
    # key_pos = order and timed exactly that artifact: 12.3 ms vs 1.4 ms
    # of real attention at B=8 S=1.)
    seen0 = 4000
    order0 = jnp.arange(policy.num_slots, dtype=jnp.int32)
    drift = seen0 - policy.window            # == D for a full sink cache
    key_pos0 = jnp.where(order0 < policy.num_sink, order0, order0 - drift)
    cache = dataclasses.replace(
        cache,
        seen=jnp.full((B,), seen0, jnp.int32),
        length=jnp.full((B,), policy.window, jnp.int32),
        order=jnp.tile(order0[None], (B, 1)),
        key_pos=jnp.tile(key_pos0[None], (B, 1)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, llm.hidden_size)) * 0.02, jnp.bfloat16)
    vl = jnp.full((B,), S, jnp.int32)

    # 1. full chunk — only when asked: compiling the 7B loop twice costs
    # minutes over the tunnel; the scan-fps bench already pins this number.
    # params go in as arguments (closure capture = 6.4 GB of constants and
    # a tens-of-minutes remote compile).
    import os
    t_full = float("nan")
    if os.environ.get("AHA_DECOMP_FULL"):
        t_full = slope(lambda x, c, p: qwen2.decode_chunk(p, llm, policy, c, x, vl)[0],
                       (x, cache, params))

    print("built params; timing attention...", flush=True)
    # 2. attention alone (one layer x num_layers)
    plan = plan_update(cache, policy, vl, S)
    q = jnp.asarray(rng.standard_normal((B, S, llm.num_heads, llm.head_dim)) * 0.1,
                    jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((B, policy.num_slots, llm.num_kv_heads,
                                          llm.head_dim)) * 0.1, jnp.bfloat16)
    t_attn = slope(lambda q, kc: attention.cached_attention(
        q, kc, kc, plan, rope_theta=llm.rope_theta,
        sink_slots=policy.num_sink), (q, kc)) * llm.num_layers

    print(f"attn done: {t_attn:.2f}", flush=True)
    # 3. KV scatter write alone
    kn = jnp.asarray(rng.standard_normal((B, S, llm.num_kv_heads, llm.head_dim)) * 0.1,
                     jnp.bfloat16)
    t_write = slope(lambda kn, kc: write_layer(kc, kc, kn, kn, plan,
                                               rope_theta=llm.rope_theta)[0],
                    (kn, kc)) * llm.num_layers

    print(f"write done: {t_write:.2f}", flush=True)
    # 4. matmul chain alone (qkv + o + mlp at layer 0, w8a8). params go in
    # as ARGUMENTS — closing over them bakes 6.4 GB of constants into the
    # program and the remote compile takes tens of minutes over the tunnel.
    lyr0 = params["layers"]
    def mats(x, lyr):
        h = qwen2.rms_norm(x, lyr["input_norm"]["scale"][0], llm.rms_norm_eps)
        q, k, v = qwen2._qkv(h, lyr, llm, None, 0.0, layer=jnp.int32(0))
        o = qwen2.linear(q.reshape(B, S, -1), lyr["o_proj"], None, 0.0,
                         layer=jnp.int32(0))
        m = qwen2._mlp(h, lyr, None, 0.0, layer=jnp.int32(0))
        return o + m
    t_mats = slope(mats, (x, lyr0)) * llm.num_layers

    print(f"mats done: {t_mats:.2f}", flush=True)
    # 5. lm_head + repetition penalty + argmax (the per-token sampling tail
    # of engine.generate) and the token embedding gather
    from aha_tpu.streaming.engine import _apply_repetition_penalty

    hid = jnp.asarray(rng.standard_normal((B, llm.hidden_size)) * 0.02, jnp.bfloat16)
    counts = jnp.zeros((B, llm.vocab_size), jnp.int32)

    def lm_tail(hid, lm, counts):
        logits = qwen2.lm_logits({"lm_head": lm, "embed": params["embed"]},
                                 llm, hid).astype(jnp.float32)
        return jnp.argmax(_apply_repetition_penalty(logits, counts, 1.05),
                          axis=-1).astype(jnp.int32)
    t_lm = slope(lambda h, lm, c: lm_tail(h, lm, c).astype(h.dtype),
                 (hid, params["lm_head"], counts))

    tok = jnp.zeros((B,), jnp.int32)
    t_emb = slope(lambda t, p: qwen2.embed_tokens({"embed": p}, t)[..., 0].astype(
        jnp.float32), (tok, params["embed"]))

    print(f"B={B} S={S}: full chunk {t_full:7.2f} ms | attention x{llm.num_layers} "
          f"{t_attn:6.2f} | kv-write x{llm.num_layers} {t_write:6.2f} | "
          f"matmuls x{llm.num_layers} {t_mats:6.2f} | lm+sample {t_lm:6.2f} | "
          f"embed {t_emb:6.2f} | "
          f"chunk-unaccounted {t_full - t_attn - t_write - t_mats:6.2f}", flush=True)


if __name__ == "__main__":
    for b in ([int(sys.argv[1])] if len(sys.argv) > 1 else [1, 8, 16]):
        main(b)

"""Isolated cost of one cached_attention chunk (jnp path) vs batch size,
and the split between the O(W) cache rotation and the einsum/softmax core.

Decides whether a pre-rotated-K cache redesign is worth it: the current
path re-rotates all W+1 cached keys per chunk per layer (28x/frame).

Run on the TPU:  python scripts/perf/ab_attn_scaling.py
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax, jax.numpy as jnp

from aha_tpu.ops import attention
from aha_tpu.ops.kv_cache import CachePolicy, init_cache, plan_update
from aha_tpu.ops.rope import apply_rope, rope_cos_sin

S, NH, KVH, Dh, W = 56, 28, 4, 128, 2048
THETA = 1e6


def slope(fn, args, n1=8, n2=40, reps=4):
    def mk(n):
        @jax.jit
        def loop(args, n_=n):
            def body(i, a):
                out = fn(*a)
                eps = (out.mean() * 1e-6).astype(a[0].dtype)
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
    return (min(ts[1]) - min(ts[0])) / (n2 - n1) * 1e3   # ms per call


def run(B):
    rng = np.random.default_rng(0)
    policy = CachePolicy(kind="sink", window=W, num_sink=32)
    cache = init_cache(policy, num_layers=1, batch=B, num_kv_heads=KVH,
                       head_dim=Dh, dtype=jnp.bfloat16)
    # steady state: cache full
    import dataclasses
    cache = dataclasses.replace(
        cache,
        seen=jnp.full((B,), 4000, jnp.int32), length=jnp.full((B,), W, jnp.int32),
        order=jnp.tile(jnp.arange(W + 1, dtype=jnp.int32)[None], (B, 1)),
        key_pos=jnp.tile(jnp.arange(W + 1, dtype=jnp.int32)[None], (B, 1)))
    plan = plan_update(cache, policy, jnp.full((B,), S, jnp.int32), S)
    q = jnp.asarray(rng.standard_normal((B, S, NH, Dh)) * 0.1, jnp.bfloat16)
    kc = jnp.asarray(rng.standard_normal((B, W + 1, KVH, Dh)) * 0.1, jnp.bfloat16)
    vc = jnp.asarray(rng.standard_normal((B, W + 1, KVH, Dh)) * 0.1, jnp.bfloat16)
    key_pos = plan.new_key_pos

    # post-redesign path: pre-rotated cache + sink-column correction
    full = lambda q, kc, vc: attention.cached_attention(
        q, kc, vc, plan, rope_theta=THETA, sink_slots=policy.num_sink)

    # core = prerotated-cache simulation: q rotation + einsums + softmax,
    # but NO O(W) cache rotation
    q_cos, q_sin = rope_cos_sin(plan.q_pos, Dh, THETA)
    from aha_tpu.ops.kv_cache import attention_slot_mask
    mask0 = attention_slot_mask(plan)

    def core(q, kc, vc):
        q_rot = apply_rope(q.astype(jnp.float32), q_cos, q_sin).astype(q.dtype)
        qg = q_rot.reshape(B, S, KVH, NH // KVH, Dh)
        scores = jnp.einsum("bsgrd,bwgd->bgrsw", qg, kc,
                            preferred_element_type=jnp.float32) / np.sqrt(Dh)
        scores = jnp.where(mask0[:, None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bgrsw,bwgd->bsgrd", probs.astype(vc.dtype), vc,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, S, NH, Dh).astype(q.dtype)

    # rotation only
    k_cos, k_sin = rope_cos_sin(key_pos, Dh, THETA)
    rot = lambda q, kc, vc: apply_rope(
        kc.astype(jnp.float32), k_cos, k_sin).astype(kc.dtype) * q.mean()

    t_full = slope(full, (q, kc, vc))
    t_core = slope(core, (q, kc, vc))
    t_rot = slope(rot, (q, kc, vc))
    print(f"B={B:3d}: full {t_full:7.3f} ms/layer-chunk | core {t_core:7.3f} "
          f"| cache-rotation {t_rot:7.3f} | x28 layers: full {28*t_full:6.2f} ms "
          f"core {28*t_core:6.2f} ms", flush=True)


if __name__ == "__main__":
    for B in (1, 8, 16, 32):
        run(B)

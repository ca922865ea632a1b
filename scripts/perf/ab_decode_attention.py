"""In-process A/B: Pallas fused decode-attention vs the jnp path, real chip.

7B attention shapes, full sink cache (W=2048, slot-aligned). Run on the TPU:
    python scripts/perf/ab_decode_attention.py
(One TPU process at a time; timing synced with jax.device_get.)
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
import numpy as np
import jax, jax.numpy as jnp

from aha_tpu.ops import attention
from aha_tpu.ops.kv_cache import CachePolicy, advance, init_cache, plan_update, write_layer
from aha_tpu.ops.rope import apply_rope, rope_cos_sin
from aha_tpu.ops.pallas.decode_attention import cached_decode_attention


def bench_fused(make_step, q0, kc0, n=100, reps=5):
    """Time n chained iterations INSIDE one jit (the tunnel adds ~0.4 ms per
    dispatch, swamping sub-ms kernels). make_step(q, kc) -> out; the loop
    perturbs BOTH q and the key cache each iteration so nothing (esp. the
    key rotation) can be hoisted as loop-invariant — matching real decode,
    where every chunk mutates the cache."""
    def make_loop(n):
        @jax.jit
        def loop(q, kc, n_=n):
            def body(i, carry):
                q, kc = carry
                out = make_step(q, kc)
                eps = (out.mean() * 1e-6).astype(kc.dtype)
                return out.astype(q.dtype), kc + eps
            q, kc = jax.lax.fori_loop(0, n_, body, (q, kc))
            return q
        return loop

    # The axon tunnel adds a ~45 ms FIXED dispatch+fetch cost per call that
    # swamps per-iteration time; measure the slope between two loop lengths.
    n1, n2 = n, 4 * n
    l1, l2 = make_loop(n1), make_loop(n2)
    t1s, t2s = [], []
    for l, ts in ((l1, t1s), (l2, t2s)):
        jax.device_get(l(q0, kc0))
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.device_get(l(q0, kc0))
            ts.append(time.perf_counter() - t0)
    return (min(t2s) - min(t1s)) / (n2 - n1) * 1e3


def run(B=1, S=49, NH=28, KVH=4, Dh=128, theta=1e6, dt=jnp.bfloat16):
    policy = CachePolicy("sink", window=2048, num_sink=32).with_aligned_slots()
    rng = np.random.default_rng(0)
    cache = init_cache(policy, num_layers=1, batch=B, num_kv_heads=KVH,
                       head_dim=Dh, dtype=dt)
    plan0 = plan_update(cache, policy, jnp.full((B,), 2048, jnp.int32), 2048)
    k_fill = jnp.asarray(rng.standard_normal((B, 2048, KVH, Dh)), dt)
    v_fill = jnp.asarray(rng.standard_normal((B, 2048, KVH, Dh)), dt)
    k_c, v_c, _, _ = write_layer(cache.k[0], cache.v[0], k_fill, v_fill, plan0,
                                 rope_theta=theta)
    cache = advance(cache, plan0, cache.k.at[0].set(k_c), cache.v.at[0].set(v_c))

    plan = plan_update(cache, policy, jnp.full((B,), S, jnp.int32), S)
    k_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), dt)
    v_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), dt)
    q = jnp.asarray(rng.standard_normal((B, S, NH, Dh)), dt)
    k_c, v_c, _, _ = write_layer(cache.k[0], cache.v[0], k_new, v_new, plan,
                                 rope_theta=theta)

    sink = policy.num_sink if policy.kind == "sink" else 0
    w_cos, w_sin = rope_cos_sin(plan.write_pos, Dh, theta)
    q_rot = apply_rope(q.astype(jnp.float32), w_cos, w_sin).astype(dt)
    delta = (plan.g[:, :1] - plan.q_pos[:, :1]).astype(jnp.int32)
    slot_idx = jnp.arange(k_c.shape[1], dtype=jnp.int32)[None, :]
    d_cos, d_sin = rope_cos_sin(jnp.where(slot_idx < sink, delta, 0), Dh, theta)

    jnp_fn = jax.jit(lambda q, kc, vc: attention.cached_attention(
        q, kc, vc, plan, rope_theta=theta, sink_slots=sink))
    pal_fn = jax.jit(lambda qr, kc, vc: cached_decode_attention(
        qr, kc, vc, d_cos, d_sin, plan.new_order, plan.g))

    import os
    os.environ["AHA_DECODE_ATTN"] = "jnp"  # keep the jnp fn honest
    ref = jax.device_get(jnp_fn(q, k_c, v_c))
    out = jax.device_get(pal_fn(q_rot, k_c, v_c))
    err = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32)).max()
    t_jnp = bench_fused(lambda qq, kc: jnp_fn(qq, kc, v_c), q, k_c)
    t_pal = bench_fused(lambda qq, kc: pal_fn(qq, kc, v_c), q_rot, k_c)
    print(f"B={B} S={S}: max_err={err:.4f}  jnp={t_jnp:.3f}ms  "
          f"pallas={t_pal:.3f}ms  speedup={t_jnp/t_pal:.2f}x")


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    run(S=49)   # frame chunk
    run(S=1)    # single-token decode
    run(B=8, S=49)  # multi-stream batch

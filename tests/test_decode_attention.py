"""Parity: the fused Pallas decode-attention kernel vs the jnp reference
path (ops/attention.cached_attention) over the ring-buffer cache.

Runs in interpret mode on CPU at kernel-compatible shapes (Dh=128,
num_slots % block == 0); the real-chip A/B lives in bench.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aha_tpu.ops import attention
from aha_tpu.ops.kv_cache import CachePolicy, advance, init_cache, plan_update, write_layer
from aha_tpu.ops.pallas.decode_attention import cached_decode_attention
from aha_tpu.ops.rope import apply_rope, rope_cos_sin

THETA = 10_000.0


def _run_chunk(cache, policy, k_new, v_new, q, valid_len):
    """One layer-0 chunk through both attention backends (pre-rotated cache)."""
    S = q.shape[1]
    Dh = q.shape[-1]
    plan = plan_update(cache, policy, valid_len, S)
    k_c, v_c, _, _ = write_layer(cache.k[0], cache.v[0], k_new, v_new, plan,
                                 rope_theta=THETA)
    sink_slots = policy.num_sink if policy.kind == "sink" else 0

    ref = attention.cached_attention(
        q, k_c, v_c, plan, rope_theta=THETA, sink_slots=sink_slots,
        sink_policy=policy.kind == "sink",
        evicting=policy.kind in ("sink", "sliding"))

    # kernel path: q rotated at write_pos; per-slot delta rotation
    # delta_k = key_pos_k - g_k + D composes the reference's q_pos - key_pos
    # distance on top of the stored keys for every occupied slot (D for
    # sinks, 0 for steady ring slots, the residual during the fill
    # transient) — mirrors the production formula in cached_attention
    w_cos, w_sin = rope_cos_sin(plan.write_pos, Dh, THETA)
    q_rot = apply_rope(q.astype(jnp.float32), w_cos, w_sin).astype(q.dtype)
    delta = (plan.g[:, :1] - plan.q_pos[:, :1]).astype(jnp.int32)
    if policy.kind == "sink":
        delta_pos = jnp.where(plan.new_order >= 0,
                              plan.new_key_pos - plan.new_order + delta, 0)
    else:
        delta_pos = jnp.zeros_like(plan.new_key_pos)
    d_cos, d_sin = rope_cos_sin(delta_pos, Dh, THETA)
    # hf-mode mask operands, exactly as cached_attention hands them to the
    # kernel (ref_idx <-> order, q_pos <-> g) for evicting policies
    if policy.kind in ("sink", "sliding"):
        from aha_tpu.ops.kv_cache import reference_mask_operands

        mask_order, mask_g = reference_mask_operands(
            plan, sink_slots=sink_slots)
    else:
        mask_order, mask_g = plan.new_order, plan.g
    out = cached_decode_attention(
        q_rot, k_c, v_c, d_cos, d_sin, mask_order, mask_g, interpret=True)

    cache = advance(cache, plan, cache.k.at[0].set(k_c), cache.v.at[0].set(v_c))
    return cache, np.asarray(ref), np.asarray(out)


@pytest.mark.parametrize("kind,window,pad", [
    pytest.param("sliding", 192, 64, marks=pytest.mark.slow),  # num_slots 256
    ("sink", 192, 64),   # smoke: the policy with the correction machinery
    pytest.param("none", 224, 32, marks=pytest.mark.slow),
])
def test_pallas_decode_attention_matches_jnp(kind, window, pad):
    policy = CachePolicy(kind, window=window, num_sink=16, slot_pad=pad)
    rng = np.random.default_rng(0)
    B, KVH, NH, Dh = 2, 2, 4, 128
    cache = init_cache(policy, num_layers=1, batch=B, num_kv_heads=KVH,
                       head_dim=Dh, dtype=jnp.float32)

    # chunk 1: ragged valid lengths incl. padding rows
    for S, vl in [(112, (100, 60)), (96, (96, 96)), (64, (40, 64))]:
        k_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((B, S, NH, Dh)), jnp.float32)
        # 1e-4: during the fill transient the jnp path rotates keys
        # write_pos -> key_pos while the kernel composes delta_pos on the
        # stored keys — same angles, different f32 evaluation order
        cache, ref, out = _run_chunk(cache, policy, k_new, v_new, q,
                                     jnp.asarray(vl, jnp.int32))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_decode_attention_single_token():
    """The generate() path: S=1 chunks (M = n_rep rows, padded to 16)."""
    policy = CachePolicy("sliding", window=120, slot_pad=8)  # num_slots 128
    rng = np.random.default_rng(1)
    B, KVH, NH, Dh = 1, 2, 6, 128
    cache = init_cache(policy, num_layers=1, batch=B, num_kv_heads=KVH,
                       head_dim=Dh, dtype=jnp.float32)
    # prefill then single-token steps (incl. the empty-step edge case)
    for S, vl in [(32, (32,)), (1, (1,)), (1, (0,))]:
        k_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), jnp.float32)
        q = jnp.asarray(rng.standard_normal((B, S, NH, Dh)), jnp.float32)
        cache, ref, out = _run_chunk(cache, policy, k_new, v_new, q,
                                     jnp.asarray(vl, jnp.int32))
        np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_pallas_decode_attention_int8_kv():
    """int8 KV cache under the kernel: it streams the int8 buffers and
    folds the per-(slot, head) scales into score/prob columns in VMEM
    (previously it required a host-side dequant pass that negated int8
    KV's halved attention DMA — ADVICE r2). Output must match (a) the
    jnp int8 path and (b) the kernel fed the pre-dequantized cache."""
    from aha_tpu.ops.kv_cache import quantize_kv

    policy = CachePolicy("sliding", window=120, slot_pad=8)  # num_slots 128
    rng = np.random.default_rng(3)
    B, KVH, NH, Dh = 2, 2, 4, 128
    cache = init_cache(policy, num_layers=1, batch=B, num_kv_heads=KVH,
                       head_dim=Dh, dtype=jnp.float32)
    # fill past the window so occupied slots + eviction are in play
    S = 96
    for vl in [(96, 80), (64, 96)]:
        k_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, S, KVH, Dh)), jnp.float32)
        plan = plan_update(cache, policy, jnp.asarray(vl, jnp.int32), S)
        k_c, v_c, _, _ = write_layer(cache.k[0], cache.v[0], k_new, v_new,
                                     plan, rope_theta=THETA)
        cache = advance(cache, plan,
                        cache.k.at[0].set(k_c), cache.v.at[0].set(v_c))

    # quantize the whole (already-written, pre-rotated) cache per
    # (slot, head) — the same convention write_layer uses in int8 KV mode
    kq, ks = quantize_kv(k_c)
    vq, vs = quantize_kv(v_c)

    Sq = 8
    q = jnp.asarray(rng.standard_normal((B, Sq, NH, Dh)), jnp.float32)
    plan = plan_update(cache, policy, jnp.asarray((Sq, Sq), jnp.int32), Sq)
    from aha_tpu.ops.kv_cache import reference_mask_operands

    mask_order, mask_g = reference_mask_operands(plan, sink_slots=0)
    w_cos, w_sin = rope_cos_sin(plan.write_pos, Dh, THETA)
    q_rot = apply_rope(q.astype(jnp.float32), w_cos, w_sin).astype(q.dtype)
    d_cos, d_sin = rope_cos_sin(jnp.zeros_like(plan.new_key_pos), Dh, THETA)

    # NOTE: this scores q against the cache WITHOUT writing this chunk's
    # keys (a read-only comparison of the three attention backends on
    # identical operands; in-flight K/V handling is covered elsewhere)
    out_int8 = cached_decode_attention(
        q_rot, kq, vq, d_cos, d_sin, mask_order, mask_g, (ks, vs),
        interpret=True)
    deq_k = (kq.astype(jnp.float32) * ks[..., None])
    deq_v = (vq.astype(jnp.float32) * vs[..., None])
    out_deq = cached_decode_attention(
        q_rot, deq_k, deq_v, d_cos, d_sin, mask_order, mask_g,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out_int8), np.asarray(out_deq),
                               rtol=2e-5, atol=2e-5)

    ref = attention.cached_attention(
        q, kq, vq, plan, rope_theta=THETA, sink_policy=False,
        evicting=True, kv_scales=(ks, vs))
    np.testing.assert_allclose(np.asarray(out_int8), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_aligned_slots_policy():
    p = CachePolicy("sink", window=2048, num_sink=32).with_aligned_slots()
    assert p.num_slots % 128 == 0 and p.num_slots > 2048
    assert p.junk == 2048
    tiny = CachePolicy("sliding", window=8).with_aligned_slots()
    assert tiny.num_slots % 128 == 0


def test_engine_aligns_slots_for_pallas(monkeypatch):
    """AHA_DECODE_ATTN=pallas must actually reach the kernel: the engine
    realigns the cache slots (regression: the env var silently fell back
    to jnp because 2049 % 8 != 0)."""
    import jax.numpy as jnp

    from aha_tpu.config import aha_tiny
    from aha_tpu.models import aha as aha_mod
    from aha_tpu.ops.kv_cache import CachePolicy
    from aha_tpu.streaming.engine import StreamEngine

    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha_mod.build_model_and_tokenizer(cfg, seed=0)
    policy = CachePolicy("sink", window=64, num_sink=4)
    monkeypatch.setenv("AHA_DECODE_ATTN", "pallas")
    eng = StreamEngine(params, cfg, policy)
    assert eng.policy.num_slots % 128 == 0
    monkeypatch.delenv("AHA_DECODE_ATTN")
    eng2 = StreamEngine(params, cfg, policy)
    assert eng2.policy.num_slots == 65

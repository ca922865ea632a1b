"""KV ring-buffer cache parity tests.

Oracle = the reference's own torch cache classes (SinkCache /
SlidingWindowCache / TrulyStaticCache), loaded from the read-only mount and
driven with identical random K/V streams. The reference stores rotated keys
and re-rotates on eviction; we store keys pre-rotated at write_pos + per-slot
positions — so we compare *effective* rotated keys (stored keys rotated by
the residual key_pos - write_pos), values, ordering, and query positions
after every chunk.
"""

import importlib.util

import numpy as np
import pytest

import jax.numpy as jnp

from aha_tpu.ops.kv_cache import (
    CachePolicy,
    advance,
    attention_slot_mask,
    init_cache,
    plan_update,
    write_layer,
)
from aha_tpu.ops.rope import rope_cos_sin, rotate_by_positions
from aha_tpu.ops.attention import cached_attention, causal_attention

KVH, DH = 2, 8
THETA = 10000.0


def _load_ref(reference_root, name):
    torch = pytest.importorskip("torch")
    import transformers

    class _BareCache:
        """Stand-in for the transformers Cache base: the installed version's
        __init__ signature changed; the reference classes only need a no-op."""

        def __init__(self, *a, **k):
            pass

    real = transformers.Cache
    transformers.Cache = _BareCache
    try:
        spec = importlib.util.spec_from_file_location(name, reference_root / "test" / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        transformers.Cache = real
    return mod, torch


def _torch_rope_table(torch, max_pos):
    cos, sin = rope_cos_sin(jnp.arange(max_pos), DH, THETA)
    return torch.tensor(np.asarray(cos)), torch.tensor(np.asarray(sin))


def _rotate_torch(torch, x, cos, sin, positions):
    # x: [1, H, S, D]; rotate by given positions using the same convention
    c = cos[positions][None, None]  # [1,1,S,D]
    s = sin[positions][None, None]
    x1, x2 = x[..., : DH // 2], x[..., DH // 2 :]
    rot = torch.cat([-x2, x1], dim=-1)
    return x * c + rot * s


import functools

import jax


@functools.lru_cache(maxsize=None)
def _jitted_step(policy: CachePolicy, S: int):
    """One compiled cache-update step per (policy, chunk size) — the same
    pattern the streaming engine uses (compile once, reuse every frame)."""

    @jax.jit
    def step(cache, k_new, v_new, valid_len):
        plan = plan_update(cache, policy, valid_len, S)
        k_c, v_c, _, _ = write_layer(cache.k[0], cache.v[0], k_new, v_new, plan,
                                     rope_theta=THETA)
        return advance(cache, plan, k_c[None], v_c[None])

    return step


def _np_rotate(k, pos):
    """numpy rope (same convention) — keeps the comparison off the jax compiler."""
    half = DH // 2
    inv_freq = 1.0 / (THETA ** (np.arange(half) / half))
    freqs = pos[:, None] * inv_freq
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos, sin = np.cos(emb)[:, None, :], np.sin(emb)[:, None, :]
    k1, k2 = k[..., :half], k[..., half:]
    rot = np.concatenate([-k2, k1], axis=-1)
    return k * cos + rot * sin


def _my_effective_kv(cache, policy):
    """Valid slots sorted by global order -> (effective rotated keys, values,
    orders). The cache stores keys PRE-ROTATED at write_pos (absolute g for
    the sink policy, insert position otherwise); the reference-visible key is
    the stored key rotated by the residual key_pos - write_pos (zero for
    non-sink policies)."""
    order = np.asarray(cache.order[0])
    valid = np.nonzero(order >= 0)[0]
    valid = valid[np.argsort(order[valid])]
    k = np.asarray(cache.k[0, 0])[valid]          # [T, KVH, DH] pre-rotated
    pos = np.asarray(cache.key_pos[0])[valid].astype(np.float64)
    stored = order[valid].astype(np.float64) if policy.kind == "sink" else pos
    k_rot = _np_rotate(k.astype(np.float64), pos - stored)
    v = np.asarray(cache.v[0, 0])[valid]
    return k_rot, v, order[valid]


def _drive_both(reference_root, ref_name, ref_ctor, policy, chunk_sizes, seed=0):
    mod, torch = _load_ref(reference_root, ref_name)
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)

    ref_cache = ref_ctor(mod)
    my = init_cache(policy, num_layers=1, batch=1, num_kv_heads=KVH, head_dim=DH, dtype=jnp.float32)
    cos_t, sin_t = _torch_rope_table(torch, 4096)

    for S in chunk_sizes:
        k = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)
        v = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)

        # ---- reference: rotate keys at current positions, then update
        past = ref_cache.get_seq_length(0)
        pos = torch.arange(past, past + S)
        kt = torch.tensor(k).permute(0, 2, 1, 3)  # [1, KVH, S, DH]
        vt = torch.tensor(v).permute(0, 2, 1, 3)
        k_rot_t = _rotate_torch(torch, kt, cos_t, sin_t, pos)
        ref_cache.update(k_rot_t, vt, 0, cache_kwargs={"sin": sin_t, "cos": cos_t})

        # ---- ours
        assert int(my.length[0]) == past, "query-position base must match reference"
        my = _jitted_step(policy, S)(my, jnp.asarray(k), jnp.asarray(v), jnp.array([S], jnp.int32))

        # ---- compare effective contents
        ref_k = ref_cache.key_cache[0].permute(0, 2, 1, 3)[0].numpy()  # [T, KVH, DH]
        ref_v = ref_cache.value_cache[0].permute(0, 2, 1, 3)[0].numpy()
        my_k, my_v, _ = _my_effective_kv(my, policy)
        assert my_k.shape == ref_k.shape, f"len mismatch {my_k.shape} vs {ref_k.shape}"
        np.testing.assert_allclose(my_v, ref_v, rtol=0, atol=0)
        np.testing.assert_allclose(my_k, ref_k, rtol=2e-5, atol=2e-5)
    return my


def test_sink_cache_parity_stepwise(reference_root):
    policy = CachePolicy("sink", window=16, num_sink=3)
    _drive_both(
        reference_root,
        "sink_cache",
        lambda m: m.SinkCache(window_length=16, num_sink_tokens=3),
        policy,
        chunk_sizes=[5] + [1] * 30,
    )


def test_sink_cache_parity_chunked(reference_root):
    policy = CachePolicy("sink", window=20, num_sink=4)
    _drive_both(
        reference_root,
        "sink_cache",
        lambda m: m.SinkCache(window_length=20, num_sink_tokens=4),
        policy,
        chunk_sizes=[7, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3],
    )


def test_sliding_window_parity(reference_root):
    policy = CachePolicy("sliding", window=8)
    _drive_both(
        reference_root,
        "sliding_window_cache",
        lambda m: m.SlidingWindowCache(window_length=8),
        policy,
        chunk_sizes=[3, 3, 3, 3, 3, 1, 2],
    )


def test_static_cache_parity(reference_root):
    policy = CachePolicy("static", window=12)
    _drive_both(
        reference_root,
        "static_cache",
        lambda m: m.TrulyStaticCache(window_size=12),
        policy,
        chunk_sizes=[5, 4, 4, 4],  # freezes at the first 5-token chunk
    )


def test_static_cache_truncates_first_chunk(reference_root):
    policy = CachePolicy("static", window=4)
    my = _drive_both(
        reference_root,
        "static_cache",
        lambda m: m.TrulyStaticCache(window_size=4),
        policy,
        chunk_sizes=[7, 3],
    )
    assert int(my.length[0]) == 4


# ---------------------------------------------------------------------------
# Pure-jax semantics tests (no reference needed)
# ---------------------------------------------------------------------------


def test_padded_tokens_go_to_junk():
    policy = CachePolicy("sliding", window=8)
    my = init_cache(policy, num_layers=1, batch=2, num_kv_heads=KVH, head_dim=DH, dtype=jnp.float32)
    S = 4
    plan = plan_update(my, policy, jnp.array([2, 4], jnp.int32), S)
    # batch 0: last two tokens invalid -> junk slot
    assert plan.slots[0, 2] == policy.junk and plan.slots[0, 3] == policy.junk
    assert plan.slots[1, 3] != policy.junk
    assert int(plan.new_seen[0]) == 2 and int(plan.new_seen[1]) == 4
    assert int(plan.new_order[0, policy.junk]) == -1


def test_intra_chunk_causal_mask():
    policy = CachePolicy("none", window=8)
    my = init_cache(policy, num_layers=1, batch=1, num_kv_heads=KVH, head_dim=DH, dtype=jnp.float32)
    plan = plan_update(my, policy, jnp.array([3], jnp.int32), 3)
    mask = np.asarray(attention_slot_mask(plan)[0])  # [S, W+1]
    # token 0 sees slot 0 only; token 2 sees slots 0..2
    assert mask[0, :3].tolist() == [True, False, False]
    assert mask[2, :3].tolist() == [True, True, True]
    assert not mask[:, policy.junk].any()


def test_chunked_cached_attention_matches_full_causal():
    """Streaming with the unbounded policy must equal one-shot causal attention."""
    rng = np.random.default_rng(1)
    B, T, NH = 2, 12, 4
    q = rng.standard_normal((B, T, NH, DH)).astype(np.float32)
    k = rng.standard_normal((B, T, KVH, DH)).astype(np.float32)
    v = rng.standard_normal((B, T, KVH, DH)).astype(np.float32)

    full = causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), rope_theta=THETA)

    policy = CachePolicy("none", window=T)
    cache = init_cache(policy, num_layers=1, batch=B, num_kv_heads=KVH, head_dim=DH, dtype=jnp.float32)
    outs = []
    # equal chunk sizes: each distinct S is a fresh jit compile, and compiles
    # dominate this test's wall time on the 1-core host
    for start, size in [(0, 4), (4, 4), (8, 4)]:
        plan = plan_update(cache, policy, jnp.full((B,), size, jnp.int32), size)
        k_c, v_c, _, _ = write_layer(
            cache.k[0], cache.v[0],
            jnp.asarray(k[:, start : start + size]), jnp.asarray(v[:, start : start + size]),
            plan, rope_theta=THETA,
        )
        cache = advance(cache, plan, k_c[None], v_c[None])
        out = cached_attention(
            jnp.asarray(q[:, start : start + size]), k_c, v_c, plan,
            rope_theta=THETA,
        )
        outs.append(np.asarray(out))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, np.asarray(full), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_cache_policy_fuzz_random_chunks():
    """Fuzz: random chunk sizes / valid lens across all policies must keep
    invariants (length bounds, junk slot never valid, order monotone in
    occupied slots, seen = sum of valids)."""
    import numpy as np

    from aha_tpu.ops.kv_cache import (
        CachePolicy, advance, attention_slot_mask, init_cache, plan_update,
        write_layer,
    )

    rng = np.random.default_rng(0)
    for kind in ("none", "sliding", "sink", "static"):
        # 'none' is unbounded growth: its window must cover the whole stream
        W = 128 if kind == "none" else 24
        policy = CachePolicy(kind=kind, window=W, num_sink=4)
        cache = init_cache(policy, num_layers=1, batch=2, num_kv_heads=1,
                           head_dim=4, dtype=jnp.float32)
        total = np.zeros(2, np.int64)
        for _ in range(12):
            S = int(rng.integers(1, 7))
            valid = jnp.asarray(rng.integers(0, S + 1, 2), jnp.int32)
            plan = plan_update(cache, policy, valid, S)
            k_new = jnp.asarray(rng.normal(size=(2, S, 1, 4)), jnp.float32)
            k_c, v_c, _, _ = write_layer(cache.k[0], cache.v[0], k_new, k_new, plan)
            cache = advance(cache, plan, k_c[None], v_c[None])
            total += np.asarray(valid)
            mask = np.asarray(attention_slot_mask(plan))
            order = np.asarray(cache.order)
            length = np.asarray(cache.length)
            assert (length <= W).all()
            assert (order[:, W] == -1).all()          # junk slot never valid
            assert (np.asarray(cache.seen) == total).all()
            if kind == "none":
                assert (length == total).all()
            # visible slots never exceed logical length
            assert (mask.sum(axis=-1).max(axis=-1) <= np.maximum(length, 1)).all()


def test_int8_kv_cache_close_to_bf16():
    """int8 KV mode (InferConfig.kv_cache_dtype='int8'): per-(slot, head)
    quantized K/V must track the full-precision cache closely through a
    multi-chunk stream incl. ring eviction."""
    import jax

    from aha_tpu.config import qwen2_tiny
    from aha_tpu.models import qwen2

    cfg = qwen2_tiny(vocab_size=128)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    policy = CachePolicy("sink", window=24, num_sink=4)
    rng = np.random.default_rng(5)

    outs = {}
    for dt in (jnp.float32, jnp.int8):
        cache = init_cache(policy, num_layers=cfg.num_layers, batch=2,
                           num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
                           dtype=dt)
        assert cache.quantized == (dt == jnp.int8)
        hs = []
        for i in range(4):
            embeds = jnp.asarray(
                rng.standard_normal((2, 10, cfg.hidden_size)) if dt == jnp.float32
                else outs["inputs"][i], jnp.float32)
            if dt == jnp.float32:
                outs.setdefault("inputs", []).append(np.asarray(embeds))
            h, cache = qwen2.decode_chunk(params, cfg, policy, cache, embeds,
                                          jnp.asarray([10, 7], jnp.int32))
            hs.append(np.asarray(h))
        outs[jnp.dtype(dt).name] = np.concatenate(hs, axis=1)
    a, b = outs["float32"], outs["int8"]
    denom = np.abs(a).mean() + 1e-6
    rel = np.abs(a - b).mean() / denom
    assert rel < 0.02, rel


def test_kv_cache_dtype_flag_reaches_engine():
    """InferConfig.kv_cache_dtype='int8' must actually select the quantized
    cache through build_session and the multi-stream engines (regression:
    the flag used to be accepted but unwired)."""
    from aha_tpu.config import InferConfig, aha_tiny
    from aha_tpu.models import aha
    from aha_tpu.streaming.multi import MultiStreamScorer
    from aha_tpu.streaming.session import build_session

    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    icfg = InferConfig(frame_fps=1.0, frame_resolution=cfg.frame_resolution,
                       grounding_mode=True, kv_cache_policy="sink",
                       kv_window=32, num_sink_tokens=4, kv_cache_dtype="int8")
    sess = build_session(params, cfg, tok, icfg)
    assert sess.engine.new_cache().quantized
    scorer = MultiStreamScorer(params, cfg, tok, icfg, batch=2)
    assert scorer.engine.new_cache().quantized
    icfg2 = InferConfig(frame_fps=1.0, frame_resolution=cfg.frame_resolution,
                        grounding_mode=True, kv_cache_policy="sink",
                        kv_window=32, num_sink_tokens=4)
    assert not build_session(params, cfg, tok, icfg2).engine.new_cache().quantized


# ---------------------------------------------------------------------------
# Attention-output parity vs the torch SinkCache oracle (past fill boundary)
# ---------------------------------------------------------------------------


def _ref_attention_outputs(torch, ref_cache, cos_t, sin_t, q, S, q_past):
    """Reference attention for the chunk that was just updated into
    ref_cache: q rotated at [q_past, q_past+S) — q_past is the PRE-update
    cache length, exactly the position_ids HF attention uses — against the
    post-update cache contents (stored rotated). The mask is transformers
    4.49's cache_position arithmetic (kv index j visible to query i iff
    j <= q_past + i): causal before the cache fills, intra-chunk
    NON-causal after (all stored indices < window <= cache_position) —
    see CachePolicy.mask_mode. NH == KVH (no GQA rep)."""
    T = ref_cache.get_seq_length(0)
    pos = torch.arange(q_past, q_past + S)
    qt = torch.tensor(q).permute(0, 2, 1, 3).to(torch.float64)      # [1,H,S,D]
    q_rot = _rotate_torch(torch, qt, cos_t.to(torch.float64), sin_t.to(torch.float64), pos)
    k = ref_cache.key_cache[0].to(torch.float64)                    # [1,H,T,D]
    v = ref_cache.value_cache[0].to(torch.float64)
    s = q_rot @ k.transpose(-1, -2) / (DH ** 0.5)                   # [1,H,S,T]
    mask = torch.arange(T)[None, :] <= (q_past + torch.arange(S))[:, None]
    s = s.masked_fill(~mask, float("-inf"))
    p = torch.softmax(s, dim=-1)
    out = p @ v                                                     # [1,H,S,D]
    return out.permute(0, 2, 1, 3).numpy()                          # [1,S,H,D]


@pytest.mark.parametrize("chunks", [
    # partial first event: 14 + 4 = 18 > W=16 — the transition where the
    # pre-rotation algebra deviates (ADVICE r2 high finding); stream runs
    # 2+ windows past the fill so the transient also drains back to the
    # fast path and stays correct.
    [14] + [4] * 14,
    # exact-fill events (12 + 4 == 16): fast path throughout
    [4] * 16,
    # ragged chunks: several distinct residual values in flight at once
    [9, 3, 1, 5, 2, 4, 4, 1, 3, 4, 4, 4, 4],
])
def test_sink_attention_parity_past_fill(reference_root, chunks):
    """cached_attention == torch SinkCache + vanilla attention for every
    chunk of a stream driven well past the cache-fill boundary (ADVICE r2:
    the pre-rotated scheme used to diverge from the first partial eviction
    event until the pre-fill keys evicted)."""
    mod, torch = _load_ref(reference_root, "sink_cache")
    policy = CachePolicy("sink", window=16, num_sink=4)
    ref_cache = mod.SinkCache(window_length=16, num_sink_tokens=4)
    my = init_cache(policy, num_layers=1, batch=1, num_kv_heads=KVH,
                    head_dim=DH, dtype=jnp.float32)
    cos_t, sin_t = _torch_rope_table(torch, 4096)
    rng = np.random.default_rng(7)

    saw_deviation = False
    for ci, S in enumerate(chunks):
        q = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)
        k = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)
        v = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)

        # reference: rotate keys at current positions, update, attend
        past = ref_cache.get_seq_length(0)
        pos = torch.arange(past, past + S)
        kt = torch.tensor(k).permute(0, 2, 1, 3)
        k_rot_t = _rotate_torch(torch, kt, cos_t, sin_t, pos)
        ref_cache.update(k_rot_t, torch.tensor(v).permute(0, 2, 1, 3), 0,
                         cache_kwargs={"sin": sin_t, "cos": cos_t})
        ref_out = _ref_attention_outputs(torch, ref_cache, cos_t, sin_t, q, S,
                                         q_past=past)

        # ours: plan/write/attend with the sink policy
        plan = plan_update(my, policy, jnp.array([S], jnp.int32), S)
        k_c, v_c, _, _ = write_layer(my.k[0], my.v[0], jnp.asarray(k),
                                     jnp.asarray(v), plan, rope_theta=THETA)
        my = advance(my, plan, k_c[None], v_c[None])
        out = cached_attention(jnp.asarray(q), k_c, v_c, plan,
                               rope_theta=THETA, sink_slots=policy.num_sink,
                               sink_policy=True)

        # track whether this chunk exercised the transient (exact) path
        D = int(plan.g[0, 0] - plan.q_pos[0, 0])
        rho = np.asarray(plan.new_order[0] - plan.new_key_pos[0])
        occ_ring = (np.asarray(plan.new_order[0]) >= 0)
        occ_ring[:policy.num_sink] = False
        chunk_deviates = bool((rho[occ_ring] != D).any())
        saw_deviation |= chunk_deviates

        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-4,
                                   atol=5e-4, err_msg=f"chunk {ci} (S={S})")

    # every stream that fills the window hits the transient (keys written
    # before the first eviction event keep rho != D until they evict) ...
    assert saw_deviation
    # ... and drains back to the fast pre-rotation path within ~one window
    assert not chunk_deviates, "stream should end on the steady fast path"


def test_sliding_attention_parity_past_fill(reference_root):
    """Sliding policy: cached_attention (hf mask mode) == torch
    SlidingWindowCache + transformers-4.49 mask arithmetic past the fill
    boundary. The sliding reference keeps original key rotations (no
    re-rotation), so this pins both the rotation bookkeeping and the
    capped-cache_position visibility for the no-sink policy."""
    mod, torch = _load_ref(reference_root, "sliding_window_cache")
    policy = CachePolicy("sliding", window=12)
    ref_cache = mod.SlidingWindowCache(window_length=12)
    my = init_cache(policy, num_layers=1, batch=1, num_kv_heads=KVH,
                    head_dim=DH, dtype=jnp.float32)
    cos_t, sin_t = _torch_rope_table(torch, 4096)
    rng = np.random.default_rng(11)

    for ci, S in enumerate([5, 3, 4, 3, 3, 3, 3, 3]):
        q = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)
        k = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)
        v = rng.standard_normal((1, S, KVH, DH)).astype(np.float32)

        past = ref_cache.get_seq_length(0)
        pos = torch.arange(past, past + S)
        kt = torch.tensor(k).permute(0, 2, 1, 3)
        k_rot_t = _rotate_torch(torch, kt, cos_t, sin_t, pos)
        ref_cache.update(k_rot_t, torch.tensor(v).permute(0, 2, 1, 3), 0)
        ref_out = _ref_attention_outputs(torch, ref_cache, cos_t, sin_t, q, S,
                                         q_past=past)

        plan = plan_update(my, policy, jnp.array([S], jnp.int32), S)
        k_c, v_c, _, _ = write_layer(my.k[0], my.v[0], jnp.asarray(k),
                                     jnp.asarray(v), plan, rope_theta=THETA)
        my = advance(my, plan, k_c[None], v_c[None])
        out = cached_attention(jnp.asarray(q), k_c, v_c, plan,
                               rope_theta=THETA, evicting=True)
        np.testing.assert_allclose(np.asarray(out), ref_out, rtol=5e-4,
                                   atol=5e-4, err_msg=f"chunk {ci} (S={S})")


def test_write_layer_stacked_matches_write_layer():
    """The decode fast path's in-place stacked write (fori-loop carry,
    per-row dynamic_update_slice — see qwen2.decode_chunk) must produce
    byte-identical caches and layer slices to the reference scan-ys
    formulation's `write_layer`, in both bf16 and int8-KV modes."""
    from aha_tpu.ops.kv_cache import write_layer_stacked

    L, B = 3, 4
    policy = CachePolicy("sink", window=16, num_sink=4)
    rng = np.random.default_rng(5)

    for dtype in (jnp.bfloat16, jnp.int8):
        my = init_cache(policy, num_layers=L, batch=B, num_kv_heads=KVH,
                        head_dim=DH, dtype=dtype)
        # advance into steady state so slots wrap (seen > window)
        my = my.__class__(**{**my.__dict__,
                             "seen": jnp.full((B,), 40, jnp.int32),
                             "length": jnp.full((B,), 16, jnp.int32)})
        for S in (1, 3):
            valid_len = jnp.asarray(rng.integers(0, S + 1, B), jnp.int32)
            plan = plan_update(my, policy, valid_len, S)
            cos, sin = rope_cos_sin(plan.write_pos, DH, THETA)
            k = jnp.asarray(rng.standard_normal((B, S, KVH, DH)), jnp.float32)
            v = jnp.asarray(rng.standard_normal((B, S, KVH, DH)), jnp.float32)

            k_all, v_all = my.k, my.v
            ks_all, vs_all = my.k_scale, my.v_scale
            per_layer = []
            for i in range(L):
                ks_l = None if ks_all is None else ks_all[i]
                vs_l = None if vs_all is None else vs_all[i]
                per_layer.append(write_layer(k_all[i], v_all[i], k, v, plan,
                                             ks_l, vs_l, rot=(cos, sin)))

            sk, sv, sks, svs = k_all, v_all, ks_all, vs_all
            for i in range(L):
                (sk, sv, sks, svs, k_c, v_c, ks_c, vs_c) = write_layer_stacked(
                    sk, sv, jnp.int32(i), k, v, plan, sks, svs,
                    rot=(cos, sin))
                ref_k, ref_v, ref_ks, ref_vs = per_layer[i]
                np.testing.assert_array_equal(np.asarray(k_c), np.asarray(ref_k))
                np.testing.assert_array_equal(np.asarray(v_c), np.asarray(ref_v))
                np.testing.assert_array_equal(np.asarray(sk[i]), np.asarray(ref_k))
                if ks_c is not None:
                    np.testing.assert_array_equal(np.asarray(ks_c),
                                                  np.asarray(ref_ks))
                    np.testing.assert_array_equal(np.asarray(vs_c),
                                                  np.asarray(ref_vs))

"""Attention: cached streaming step (GQA over the ring-buffer cache) and
full-sequence causal attention for training/prefill.

The streaming path replaces the reference's HF attention + dynamic cache
(`/root/reference/test/inference.py:196-229` driving transformers Qwen2
attention). Keys live PRE-ROTATED in the cache (at plan.write_pos); sink-
cache "re-rotation" reduces to a sink-column score correction because ring
relative distances telescope to absolute token age (see cached_attention).

A reference jnp implementation is the default; Pallas kernels (ops/pallas/*)
are drop-in replacements validated against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import os

from .kv_cache import UpdatePlan, reference_mask_operands
from .rope import apply_rope, rope_cos_sin, rotate_by_positions

NEG_INF = -1e30


def _decode_attn_backend() -> str:
    """AHA_DECODE_ATTN: 'jnp' (default) or 'pallas' (the fused kernel,
    interpret mode off-TPU). Measured on v5e-1 the XLA-fused jnp path runs
    at 7.4 us/layer — ~1.4x off the K+V DMA roofline — vs 18+ us for the
    kernel (see ops/pallas/decode_attention.py docstring), so jnp is the
    default; the kernel stays as a validated alternative."""
    return os.environ.get("AHA_DECODE_ATTN", "jnp")


def _pallas_decode_ok(q, k_cache) -> bool:
    Dh, Wp = q.shape[-1], k_cache.shape[1]
    return Dh % 128 == 0 and Wp % 8 == 0


def cached_attention(
    q: jnp.ndarray,        # [B, S, NH, Dh] (unrotated)
    k_cache: jnp.ndarray,  # [B, W+1, KVH, Dh] (PRE-ROTATED at write_pos)
    v_cache: jnp.ndarray,  # [B, W+1, KVH, Dh]
    plan: UpdatePlan,
    *,
    rope_theta: float,
    sink_slots: int = 0,               # policy.num_sink for the sink policy
    sink_policy: bool = False,         # True iff policy.kind == 'sink'
    mask_mode: str = "hf",             # CachePolicy.mask_mode ('hf' | 'strict')
    evicting: bool | None = None,      # policy evicts (sink/sliding); None -> sink_policy
    transient: str = "cond",           # fill-transient handling: 'cond' puts
    # a lax.cond around this call's own attention (correct anywhere, but a
    # per-LAYER cond measured ~7% scan / ~15% decode overhead on v5e-1);
    # 'fast' / 'exact' pick one branch statically so the caller can hoist a
    # single chunk-level cond around its whole layer scan (qwen2.decode_chunk)
    rope_tables: tuple | None = None,  # (w_cos, w_sin, e_cos, e_sin), layer-invariant
    kv_scales: tuple | None = None,    # (k_scale, v_scale) [B, W+1, KVH] — int8 KV
) -> jnp.ndarray:
    """One chunk of streaming attention against the cache. Returns [B, S, NH, Dh].

    The cache holds keys pre-rotated at their ``plan.write_pos`` (absolute
    index `g` under the sink policy, insert position otherwise), so there is
    NO O(W) per-chunk cache rotation here — the old scheme re-rotated all
    W+1 slots per chunk per layer, which dominated multi-stream serving
    (measured 214 ms of a 339 ms B=32 frame step on v5e-1).

    Correctness (sink policy; ref `/root/reference/test/sink_cache.py:
    35-55,140-152`): the reference's relative distance for a cached key is
    ``q_pos - key_pos`` where key_pos is the insert position shifted back by
    the chunk length at every eviction event. Rotating q at write_pos `g`
    against keys stored at `g_k` instead yields ``g_q - g_k``; the two agree
    exactly iff the per-slot residual ``rho_k = g_k - key_pos_k`` equals the
    per-row drift ``D = seen - length``. That holds (a) for sink columns
    never (rho=0) — fixed by scoring them with q rotated at the *effective*
    position q_pos — and (b) for ring columns ALWAYS EXCEPT the transient
    after a *partial* first eviction event (length jumps L -> W by less than
    the chunk size while retained keys still shift by the full chunk): keys
    written at or before that event keep ``rho_k != D`` until they evict,
    one window later. During that transient the jnp path switches (via
    lax.cond on ``any(rho_k != D)`` over occupied ring slots) to the exact
    rotate-at-read computation — q at q_pos against keys rotated to their
    tracked key_pos — and is bit-equal to the reference everywhere else at
    zero extra cost. The Pallas kernel composes a per-slot delta rotation
    anyway, so it uses the closed form ``delta_k = key_pos_k - g_k + D``
    (= D for sinks, 0 for steady ring slots) and is exact at all times.

    rope_tables lets the caller hoist the cos/sin computation out of the
    layer scan: (w_cos, w_sin) at plan.write_pos — the same tables
    write_layer rotates new keys with — and (e_cos, e_sin) at plan.q_pos
    (only read when sink_policy).

    kv_scales: int8 KV cache mode — the per-(slot, head) scales fold into
    the score/prob tensors instead of dequantizing the whole cache: the
    einsums (and the Pallas kernel, which takes the scales and applies
    the same algebra in VMEM) stream the int8 buffers, halving attention
    DMA. (Exception: the sink-policy transient exact path dequantizes K
    before its O(W) key rotation — paid only while a fill transient
    lasts.)"""
    B, S, NH, Dh = q.shape
    KVH = k_cache.shape[2]
    n_rep = NH // KVH
    sink_policy = sink_policy or sink_slots > 0   # back-compat: sinks imply sink kind
    if evicting is None:
        evicting = sink_policy
    # 'hf' differs from 'strict' only for evicting policies (sink/sliding)
    use_hf_mask = mask_mode == "hf" and evicting
    if use_hf_mask:
        mask_order, mask_g = reference_mask_operands(plan, sink_slots=sink_slots)
    else:
        mask_order, mask_g = plan.new_order, plan.g

    if rope_tables is None:
        w_cos, w_sin = rope_cos_sin(plan.write_pos, Dh, rope_theta)
        e_cos, e_sin = rope_cos_sin(plan.q_pos, Dh, rope_theta)
    else:
        w_cos, w_sin, e_cos, e_sin = rope_tables
    q_rot = apply_rope(q.astype(jnp.float32), w_cos, w_sin).astype(q.dtype)

    # per-row drift between absolute index and reference query position
    D = (plan.g[:, :1] - plan.q_pos[:, :1]).astype(jnp.int32)          # [B, 1]

    if _decode_attn_backend() == "pallas" and _pallas_decode_ok(q, k_cache):
        from aha_tpu.ops.pallas.decode_attention import cached_decode_attention

        # The kernel composes a per-slot rotation on top of the stored keys;
        # delta_k = key_pos_k - g_k + D makes the scored distance equal the
        # reference's q_pos - key_pos for every occupied slot (sinks get D,
        # steady ring slots get 0, transition ring slots their residual).
        # int8 KV: the kernel streams the int8 buffers and folds the
        # per-(slot, head) scales into score/prob columns in VMEM — same
        # algebra as the jnp path below, same halved attention DMA.
        if sink_policy:
            delta_pos = jnp.where(plan.new_order >= 0,
                                  plan.new_key_pos - plan.new_order + D, 0)
        else:
            delta_pos = jnp.zeros_like(plan.new_key_pos)   # write_pos == key_pos
        d_cos, d_sin = rope_cos_sin(delta_pos, Dh, rope_theta)
        # the kernel masks via (order >= 0) & (order <= g) — the hf-mode
        # operands (ref_idx, q_pos) slot straight into that comparison
        return cached_decode_attention(
            q_rot, k_cache, v_cache, d_cos, d_sin, mask_order, mask_g,
            kv_scales)

    # GQA without materializing repeated K/V: group the query heads
    # [B, S, KVH, n_rep, Dh] against the shared [B, W+1, KVH, Dh]
    qg = q_rot.reshape(B, S, KVH, n_rep, Dh)
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
    mask = ((mask_order[:, None, :] >= 0)
            & (mask_order[:, None, :] <= mask_g[:, :, None])
            )[:, None, None, :, :]                         # [B, 1, 1, S, W+1]
    ks = vs = None
    if kv_scales is not None:
        ks, vs = kv_scales
        ks = ks.transpose(0, 2, 1)[:, :, None, None, :]    # [B, KVH, 1, 1, W+1]
        vs = vs.transpose(0, 2, 1)[:, :, None, None, :]

    def part(qg_p, kc, lo, hi, *, ks_p):
        """Attention over cache slots [lo:hi) -> flash-combine state (m, l, o).

        Each part stays a single fused einsum -> mask -> exp -> einsum chain
        (no probability tensor is ever written back and re-read — an
        `.at[:sink].set()` splice on the [B, KVH, rep, S, W+1] f32 score
        tensor measured ~8 ms/frame of extra HBM traffic on the 7B at B=8).
        """
        k_p = kc[:, lo:hi]
        v_p = v_cache[:, lo:hi]
        if k_p.dtype == jnp.int8:
            k_p = k_p.astype(q.dtype)
        if v_p.dtype == jnp.int8:
            v_p = v_p.astype(q.dtype)
        # matmuls stay in the storage dtype (bf16 on TPU -> full-rate MXU)
        # with f32 accumulation; only softmax math runs in f32
        s = jnp.einsum("bsgrd,bwgd->bgrsw", qg_p, k_p,
                       preferred_element_type=jnp.float32)  # [B,KVH,rep,S,hi-lo]
        if ks_p is not None:
            s = s * ks_p[..., lo:hi]
        s = jnp.where(mask[..., lo:hi], s * scale, NEG_INF)
        m = jnp.max(s, axis=-1)                             # [B, KVH, rep, S]
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        if vs is not None:
            p = p * vs[..., lo:hi]
        o = jnp.einsum("bgrsw,bwgd->bsgrd", p.astype(v_p.dtype), v_p,
                       preferred_element_type=jnp.float32)  # [B,S,KVH,rep,Dh]
        # stats to [B, S, KVH, rep] so the combine broadcasts over o without
        # transposing the large output tensor
        return m.transpose(0, 3, 1, 2), l.transpose(0, 3, 1, 2), o

    qe = None
    if sink_policy:
        # sink columns (and the transient exact path) score against q rotated
        # at the *effective* position (the sink-policy distance q_pos - key_pos)
        q_eff = apply_rope(q.astype(jnp.float32), e_cos, e_sin).astype(q.dtype)
        qe = q_eff.reshape(B, S, KVH, n_rep, Dh)

    def fast_out(_=None):
        if sink_policy and sink_slots:
            m1, l1, o1 = part(qe, k_cache, 0, sink_slots, ks_p=ks)
            m2, l2, o2 = part(qg, k_cache, sink_slots, k_cache.shape[1], ks_p=ks)
            m = jnp.maximum(m1, m2)
            w1 = jnp.exp(m1 - m)
            w2 = jnp.exp(m2 - m)
            denom = l1 * w1 + l2 * w2
            return (o1 * w1[..., None] + o2 * w2[..., None]) / denom[..., None]
        m, l, o = part(qg, k_cache, 0, k_cache.shape[1], ks_p=ks)
        return o / l[..., None]

    if sink_policy and transient != "fast":
        def exact_out(_=None):
            # reference semantics computed directly: q at q_pos against keys
            # rotated from their stored write_pos (g_k) to the tracked
            # key_pos. O(W) rotation — paid only while the fill transient
            # lasts (at most one window of tokens per stream, once).
            kc = k_cache
            if kv_scales is not None:
                kc = kc.astype(jnp.float32) * kv_scales[0][..., None]
            dpos = jnp.where(plan.new_order >= 0,
                             plan.new_key_pos - plan.new_order, 0)
            kc = rotate_by_positions(kc.astype(jnp.float32), dpos,
                                     rope_theta).astype(q.dtype)
            m, l, o = part(qe, kc, 0, k_cache.shape[1], ks_p=None)
            return o / l[..., None]

        if transient == "exact":
            out = exact_out()
        else:
            # transient after an eviction event: ring slots' residual
            # rho_k = g_k - key_pos_k deviates from D (see docstring); the
            # fast pre-rotation algebra is wrong for exactly those slots
            out = jax.lax.cond(jnp.any(transient_deviation(plan, sink_slots)),
                               exact_out, fast_out, None)
    else:
        out = fast_out()
    return out.reshape(B, S, NH, Dh).astype(q.dtype)


def transient_deviation(plan: UpdatePlan, sink_slots: int) -> jnp.ndarray:
    """[B, W+1] bool — occupied ring slots whose residual rho_k = g_k -
    key_pos_k deviates from the row drift D = seen - length, i.e. slots for
    which the pre-rotation fast path would score the wrong RoPE distance.
    Nonzero only from the first eviction event until the keys written at or
    before it evict (~one window per stream, once). Layer-invariant: callers
    with a layer scan evaluate `jnp.any` of this ONCE per chunk and cond the
    whole scan (qwen2.decode_chunk) instead of paying a per-layer cond."""
    D = (plan.g[:, :1] - plan.q_pos[:, :1]).astype(jnp.int32)
    slot_ids = jnp.arange(plan.new_order.shape[1], dtype=jnp.int32)[None, :]
    rho = plan.new_order - plan.new_key_pos
    return (slot_ids >= sink_slots) & (plan.new_order >= 0) & (rho != D)


def speculative_attention(
    q: jnp.ndarray,        # [B, S, NH, Dh] (unrotated)
    k_cache: jnp.ndarray,  # [B, W+1, KVH, Dh] (PRE-ROTATED, read-only)
    v_cache: jnp.ndarray,
    k_infl: jnp.ndarray,   # [B, S, KVH, Dh] in-flight keys, PRE-ROTATED at
    #                        plans.write_pos (the values a commit would store)
    v_infl: jnp.ndarray,
    plans,                 # spec_decode.SpecPlans
    *,
    rope_theta: float,
    sink_slots: int = 0,
    sink_policy: bool = False,
    rope_tables: tuple | None = None,   # (w_cos, w_sin, e_cos, e_sin, x_cos, x_sin)
    kv_scales: tuple | None = None,     # (k_scale, v_scale) — int8 KV cache
    exact: bool = False,
) -> jnp.ndarray:
    """Speculative verify attention: one pass that scores S chunk tokens
    exactly as S sequential 1-token `cached_attention` steps would,
    WITHOUT writing the cache.

    Query p uses the p-th composed sequential operands (`spec_decode.
    plan_compose`): its cache visibility (plans.cache_mask) excludes the
    slots sequential steps 0..p would have overwritten, and the
    replacement keys are scored from the in-flight block (plans.infl_mask
    — write-then-attend parity, including the junk-slot invisibility of
    invalid/static tokens).

    exact=False: the fast pre-rotation algebra of `cached_attention`
    (ring + in-flight columns: q at write_pos against keys at write_pos;
    sink columns: q at the sequential q_pos). Valid while no composed
    step deviates (plans.exact is the gate, like decode_chunk's cond).

    exact=True: the reference rotate-at-read semantics, composed so ONE
    cache rotation serves all S steps — cache keys rotate to their
    key_pos after step 1 (plans.dpos) and ring/in-flight queries use the
    cumulative-shift-adjusted positions plans.qx, which telescope each
    step's per-row shift into the query instead of re-rotating the cache
    per step; sink columns (never shifted) score against q at q_pos.
    This covers the sink fill transient AND the permanent post-fill
    chunk/decode position lag (BASELINE.md round 3) — and amortizes the
    O(W) rotation the plain decode loop pays PER TOKEN over the whole
    verify chunk.

    In-flight V stays in the compute dtype; int8 KV scales apply to the
    cache parts only (the exact branch folds K scales before rotating,
    like cached_attention's exact_out).
    """
    B, S, NH, Dh = q.shape
    KVH = k_cache.shape[2]
    n_rep = NH // KVH
    if rope_tables is None:
        w_cos, w_sin = rope_cos_sin(plans.write_pos, Dh, rope_theta)
        e_cos, e_sin = rope_cos_sin(plans.q_pos, Dh, rope_theta)
        x_cos, x_sin = rope_cos_sin(plans.qx, Dh, rope_theta)
    else:
        w_cos, w_sin, e_cos, e_sin, x_cos, x_sin = rope_tables
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
    cache_mask = plans.cache_mask[:, None, None, :, :]   # [B,1,1,S,W+1]
    ks = vs = None
    if kv_scales is not None:
        ks, vs = kv_scales
        ks = ks.transpose(0, 2, 1)[:, :, None, None, :]
        vs = vs.transpose(0, 2, 1)[:, :, None, None, :]

    if exact:
        # fold K scales, rotate the cache to key_pos(step 1) once
        kc = k_cache
        if kv_scales is not None:
            kc = kc.astype(jnp.float32) * kv_scales[0][..., None]
        kc = rotate_by_positions(kc.astype(jnp.float32), plans.dpos,
                                 rope_theta).astype(q.dtype)
        # in-flight keys: stored commit-canonical at write_pos; re-rotate
        # the small block to qx (delta rotation, [B, S] only)
        k_if = rotate_by_positions(k_infl.astype(jnp.float32),
                                   plans.qx - plans.write_pos,
                                   rope_theta).astype(q.dtype)
        q_ring = apply_rope(q.astype(jnp.float32), x_cos, x_sin).astype(q.dtype)
        ks_cache = None     # K scales already folded
    else:
        kc = k_cache
        k_if = k_infl
        q_ring = apply_rope(q.astype(jnp.float32), w_cos, w_sin).astype(q.dtype)
        ks_cache = ks
    qg = q_ring.reshape(B, S, KVH, n_rep, Dh)

    def part(qg_p, kc, vc, mask, lo, hi, *, ks_p, vs_p):
        k_p = kc[:, lo:hi]
        v_p = vc[:, lo:hi]
        if k_p.dtype == jnp.int8:
            k_p = k_p.astype(q.dtype)
        if v_p.dtype == jnp.int8:
            v_p = v_p.astype(q.dtype)
        s = jnp.einsum("bsgrd,bwgd->bgrsw", qg_p, k_p,
                       preferred_element_type=jnp.float32)
        if ks_p is not None:
            s = s * ks_p[..., lo:hi]
        s = jnp.where(mask[..., lo:hi], s * scale, NEG_INF)
        m = jnp.max(s, axis=-1)
        p = jnp.exp(s - m[..., None])
        l = jnp.sum(p, axis=-1)
        if vs_p is not None:
            p = p * vs_p[..., lo:hi]
        o = jnp.einsum("bgrsw,bwgd->bsgrd", p.astype(v_p.dtype), v_p,
                       preferred_element_type=jnp.float32)
        return m.transpose(0, 3, 1, 2), l.transpose(0, 3, 1, 2), o

    W1 = k_cache.shape[1]
    parts = []
    if sink_policy and sink_slots:
        qe = apply_rope(q.astype(jnp.float32), e_cos, e_sin).astype(q.dtype)
        qe = qe.reshape(B, S, KVH, n_rep, Dh)
        parts.append(part(qe, kc, v_cache, cache_mask, 0, sink_slots,
                          ks_p=ks_cache, vs_p=vs))
        parts.append(part(qg, kc, v_cache, cache_mask, sink_slots, W1,
                          ks_p=ks_cache, vs_p=vs))
    else:
        parts.append(part(qg, kc, v_cache, cache_mask, 0, W1,
                          ks_p=ks_cache, vs_p=vs))
    infl_mask = plans.infl_mask[:, None, None, :, :]      # [B,1,1,S,S]
    parts.append(part(qg, k_if, v_infl, infl_mask, 0, S,
                      ks_p=None, vs_p=None))

    m = parts[0][0]
    for mp, _, _ in parts[1:]:
        m = jnp.maximum(m, mp)
    denom = 0.0
    out = 0.0
    for mp, lp, op in parts:
        w = jnp.exp(mp - m)
        denom = denom + lp * w
        out = out + op * w[..., None]
    out = out / denom[..., None]
    return out.reshape(B, S, NH, Dh).astype(q.dtype)


def blockwise_causal_attention(
    q: jnp.ndarray,  # [B, T, NH, Dh] (already rotated)
    k: jnp.ndarray,  # [B, T, KVH, Dh]
    v: jnp.ndarray,
    *,
    attn_mask: jnp.ndarray | None = None,   # [B, T] bool
    block_size: int = 512,
) -> jnp.ndarray:
    """Memory-bounded causal attention: lax.scan over query blocks, inner
    scan over KV blocks with flash-style online softmax — peak score memory
    is O(T * block) instead of O(T^2), which is what makes 100-frame
    (5k-token) training sequences fit (SURVEY §7: the full-sequence path
    would otherwise materialize a [B, H, T, T] f32 tensor per layer).

    T must be a multiple of block_size (pad + mask at the call site).
    """
    B, T, NH, Dh = q.shape
    KVH = k.shape[2]
    n_rep = NH // KVH
    assert T % block_size == 0, (T, block_size)
    nb = T // block_size
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))

    qb = q.reshape(B, nb, block_size, KVH, n_rep, Dh).swapaxes(0, 1)
    kb = k.reshape(B, nb, block_size, KVH, Dh).swapaxes(0, 1)
    vb = v.reshape(B, nb, block_size, KVH, Dh).swapaxes(0, 1)
    if attn_mask is None:
        key_valid = jnp.ones((nb, B, block_size), bool)
    else:
        key_valid = attn_mask.reshape(B, nb, block_size).swapaxes(0, 1)
    tri = jnp.tril(jnp.ones((block_size, block_size), bool))

    def q_block(carry, xs):
        qi, i = xs                                  # qi: [B, bs, KVH, rep, Dh]

        def kv_block(acc_state, ys):
            kj, vj, kv_j, j = ys
            m, l, acc = acc_state
            scores = jnp.einsum("bsgrd,btgd->bgrst", qi, kj,
                                preferred_element_type=jnp.float32) * scale
            # causal across blocks: j < i full, j == i triangular, j > i none
            blk_mask = jnp.where(
                j < i, jnp.ones_like(tri), jnp.where(j == i, tri, jnp.zeros_like(tri))
            ).astype(bool)
            mask = blk_mask[None, None, None] & kv_j[:, None, None, None, :]
            scores = jnp.where(mask, scores, NEG_INF)
            m_blk = scores.max(axis=-1)
            m_new = jnp.maximum(m, m_blk)
            safe = m_new > NEG_INF / 2
            alpha = jnp.where(safe, jnp.exp(m - m_new), 0.0)
            p = jnp.exp(scores - m_new[..., None])
            p = jnp.where(safe[..., None], p, 0.0)
            l_new = l * alpha + p.sum(axis=-1)
            acc_new = acc * alpha[..., None] + jnp.einsum(
                "bgrst,btgd->bgrsd", p.astype(vj.dtype), vj,
                preferred_element_type=jnp.float32)
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((B, KVH, n_rep, block_size), NEG_INF, jnp.float32)
        l0 = jnp.zeros((B, KVH, n_rep, block_size), jnp.float32)
        a0 = jnp.zeros((B, KVH, n_rep, block_size, Dh), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            kv_block, (m0, l0, a0),
            (kb, vb, key_valid, jnp.arange(nb)),
        )
        out = acc / jnp.maximum(l, 1e-30)[..., None]       # [B,g,r,s,Dh]
        out = out.transpose(0, 3, 1, 2, 4)                 # [B,s,g,r,Dh]
        return carry, out

    _, outs = jax.lax.scan(q_block, None, (qb, jnp.arange(nb)))
    out = outs.swapaxes(0, 1).reshape(B, T, NH, Dh)        # [B, T, NH, Dh]
    return out.astype(q.dtype)


def causal_attention(
    q: jnp.ndarray,  # [B, T, NH, Dh] (unrotated)
    k: jnp.ndarray,  # [B, T, KVH, Dh]
    v: jnp.ndarray,  # [B, T, KVH, Dh]
    *,
    rope_theta: float,
    positions: jnp.ndarray | None = None,   # [B, T]; defaults to arange
    attn_mask: jnp.ndarray | None = None,   # [B, T] bool, False = padding
    rope_tables: tuple | None = None,       # (cos, sin) [B, T, Dh], layer-invariant
) -> jnp.ndarray:
    """Full-sequence causal attention for training and prefill."""
    B, T, NH, Dh = q.shape
    KVH = k.shape[2]
    if rope_tables is not None:
        cos, sin = rope_tables
    else:
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
        cos, sin = rope_cos_sin(positions, Dh, rope_theta)
    q = apply_rope(q.astype(jnp.float32), cos, sin).astype(q.dtype)
    k = apply_rope(k.astype(jnp.float32), cos, sin).astype(k.dtype)

    # long sequences: blockwise online-softmax path bounds score memory to
    # O(T * block) — the collator's power-of-two buckets are all divisible
    if T >= 1024 and T % 512 == 0:
        return blockwise_causal_attention(q, k, v, attn_mask=attn_mask)

    n_rep = NH // KVH
    qg = q.reshape(B, T, KVH, n_rep, Dh)

    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
    scores = jnp.einsum(
        "bsgrd,btgd->bgrst", qg, k, preferred_element_type=jnp.float32
    ) * scale                                             # [B, KVH, rep, T, T]

    causal = jnp.tril(jnp.ones((T, T), bool))[None, None, None]
    mask = causal
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrst,btgd->bsgrd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, NH, Dh).astype(q.dtype)

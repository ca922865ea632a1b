"""Speculative-decode planning: exact emulation of S sequential 1-token
cache updates inside ONE verify pass.

Why this module exists (measured, BASELINE.md round 3): batched greedy
decode on the 7B runs within ~2x of the chip's practical weight-stream
limit, so the remaining decode lever is algorithmic — verify several
draft tokens per weight stream. But a chunked ``decode_chunk(S)`` is NOT
equivalent to S sequential 1-token passes once a window-evicting policy
is active: sequential queries attend to old keys that a chunked write
has already overwritten, and the eviction/shift bookkeeping interleaves
differently (probe recorded in BASELINE.md; regression:
tests/test_spec_decode.py). The reference's greedy loop
(`/root/reference/models/live_llava/modeling_live.py:64-90`) is strictly
sequential, so speculative verification must reproduce the sequential
semantics bit-for-bit or exact-greedy parity is lost.

The scheme:

  * ``plan_compose`` — compose S metadata-only ``plan_update`` steps
    (each exactly what a 1-token pass would do), keeping every
    intermediate. Pure [B, W+1] integer ops; S is small and static.
  * the verify pass is READ-ONLY: draft K/V stay in an in-flight block
    (never written to the cache), and each query position p masks the
    cache exactly as the p-th sequential step would see it — including
    masking out slots that sequential steps 0..p would have overwritten
    (their replacement keys are scored from the in-flight block).
  * ``select_meta`` / ``commit_slots`` — after acceptance, the cache
    metadata jumps to the m-th intermediate state and only the accepted
    tokens' K/V are scattered in, via a layer ``lax.scan`` (the
    formulation XLA aliases in place; a scatter on a while-loop carry
    copies the whole cache — measured 9x slower, see
    ``kv_cache.write_layer_stacked``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .attention import transient_deviation
from .kv_cache import (CachePolicy, KVCache, UpdatePlan, plan_update,
                       quantize_kv, reference_mask_operands)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SpecPlans:
    """Composition of S sequential STEP-token update plans (step=1:
    speculative decode; step=F: fused frame scoring).

    Per-token operands are stacked along axis 1 ([B, N] with N = S*step
    chunk tokens); intermediate metadata along axis 0 ([S+1, ...], entry
    j = state after j steps).
    """

    slots: jnp.ndarray       # [B, N] destination slot of token p (junk if invalid)
    g: jnp.ndarray           # [B, N] global token index
    q_pos: jnp.ndarray       # [B, N] SEQUENTIAL query position (length-capped)
    write_pos: jnp.ndarray   # [B, N] key pre-rotation position (commit-canonical)
    valid: jnp.ndarray       # [B, N] bool
    cache_mask: jnp.ndarray  # [B, N, W+1] bool — cache columns visible to query p
    infl_mask: jnp.ndarray   # [B, N, N] bool — in-flight column i visible to query p
    meta_key_pos: jnp.ndarray  # [S+1, B, W+1]
    meta_order: jnp.ndarray    # [S+1, B, W+1]
    meta_seen: jnp.ndarray     # [S+1, B]
    meta_length: jnp.ndarray   # [S+1, B]
    # exact-mode operands (reference rotate-at-read semantics, composed so
    # ONE cache rotation serves all S steps — see speculative_attention):
    #   step p's reference distance to ring slot c is
    #     q_pos_p - key_pos_c(after step p) = qx_p - key_pos_c(after step 1)
    #   because the per-step sink shift is a per-row scalar: qx folds the
    #   shifts accumulated at steps 2..p into the query position instead of
    #   re-rotating the cache per step.
    qx: jnp.ndarray          # [B, S] ring AND in-flight positions (queries
    # and in-flight keys share the offset: both are born after their own
    # step's shift, so self-distance qx_p - qx_p = 0 and cross-distances
    # telescope to the reference's q_pos_p - key_pos_i(after step p))
    dpos: jnp.ndarray        # [B, W+1] cache rotation: key_pos(step 1) - order
    exact: jnp.ndarray       # [] bool — some step deviates from the fast
    # pre-rotation algebra (sink fill transient OR the permanent post-fill
    # chunk/decode position lag); the verify pass conds to the exact branch.


def plan_compose(cache: KVCache, policy: CachePolicy,
                 valid_len: jnp.ndarray, S: int, step: int = 1) -> SpecPlans:
    """valid_len: [B] int32 in [0, S*step] — number of real tokens this
    chunk. Composes S sequential STEP-token ``plan_update`` steps:

      * step=1 — the reference greedy loop (position 0 is the carried
        token, 1.. are drafts); steps >= valid_len are exact no-ops,
        matching a 1-token pass with valid_len 0.
      * step=F — F-token frame appends (the fused frame-scoring path:
        several production `decode_chunk(F)` steps verified in ONE weight
        stream; see engine.append_frames_fused). valid tokens must be a
        per-row prefix in whole frames (valid_len = n_active_frames * F).

    Per-token operands come back with chunk axis S*step ([B, S*step]);
    metadata intermediates stay per STEP ([S+1, ...] — `select_meta` jumps
    in steps, `commit_slots` keeps in tokens).

    Mask semantics are exactly the production write-then-attend pass, per
    step: a step's queries see (a) cache columns as the step's own
    ``plan_update`` masks them — per-QUERY-token under mask_mode='hf',
    whose within-chunk visibility is non-causal post-fill (ref HF cache
    masks; engine.append_text_frames docstring) — minus columns any step
    <= p already overwrote (their replacement keys live in-flight), and
    (b) in-flight columns of steps <= p that still own their slot, gated
    by the same per-mode visibility formula (strict: g_i <= g_q; hf:
    ref_idx_i(after step p) <= q_pos_q), which reduces to within-step
    causality pre-fill and reproduces the reference's post-fill
    non-causality."""
    junk = policy.junk
    T = S * step                                          # chunk tokens
    B = cache.batch
    meta = cache
    W1 = cache.order.shape[1]
    slots, gs, q_poss, write_poss, valids = [], [], [], [], []
    qxs = []
    cache_masks, infl_masks = [], []
    metas = [(cache.key_pos, cache.order, cache.seen, cache.length)]
    written = jnp.zeros((B, W1), bool)                    # [B, W+1]
    exact = jnp.zeros((), bool)
    shift_acc = jnp.zeros((B,), jnp.int32)                # shifts at steps 2..p
    dpos = None
    sink = policy.num_sink if policy.kind == "sink" else 0
    evicting = policy.kind in ("sink", "sliding")
    use_hf = policy.mask_mode == "hf" and evicting

    # fixed-size per-token state for the in-flight masks (junk/zero padding
    # for steps not yet composed — `stored_all` gates them off)
    tok_idx = jnp.arange(T, dtype=jnp.int32)[None, :]     # [1, T]
    slots_all = jnp.full((B, T), junk, jnp.int32)
    g_all = jnp.zeros((B, T), jnp.int32)
    stored_all = jnp.zeros((B, T), bool)
    # chunk index of the latest chunk token claiming each slot: an
    # in-flight column is attendable only while it still OWNS its slot
    # (a later step reusing the slot replaces it, exactly as the
    # sequential overwrite would — only reachable when S*step nears the
    # window, e.g. tiny test caches)
    last_claim = jnp.full((B, W1), -1, jnp.int32)

    for p in range(S):
        v_p = jnp.clip(valid_len - p * step, 0, step)          # [B] 0..step
        plan: UpdatePlan = plan_update(meta, policy, v_p, step)
        if policy.kind == "sink":
            # only the sink policy deviates from the fast pre-rotation
            # algebra (production decode_chunk conds on this for sink only;
            # the other kinds score at write_pos == q_pos and are exact by
            # construction). NOTE this is not only the fill transient: any
            # post-fill mix of chunk sizes (frame appends + 1-token decode)
            # leaves permanent per-key position lags, so post-fill
            # generation lives on the exact branch (BASELINE.md round 3).
            exact = exact | jnp.any(transient_deviation(plan, sink)
                                    & plan.valid[:, :1])
        if p == 0:
            # rotation taking stored keys (pre-rotated at their write_pos =
            # order under sink) to their key_pos after step 1 — the single
            # cache rotation the exact branch needs for all S steps
            dpos = jnp.where(plan.new_order >= 0,
                             plan.new_key_pos - plan.new_order, 0)
        else:
            shift_acc = shift_acc + plan.shift
        qxs.append(plan.q_pos + shift_acc[:, None])
        slots.append(plan.slots)
        gs.append(plan.g)
        q_poss.append(plan.q_pos)
        write_poss.append(plan.write_pos)
        valids.append(plan.valid)

        stored_p = plan.valid & (plan.slots != junk)           # [B, step]
        lo = p * step
        slots_all = slots_all.at[:, lo:lo + step].set(plan.slots)
        g_all = g_all.at[:, lo:lo + step].set(plan.g)
        stored_all = stored_all.at[:, lo:lo + step].set(stored_p)
        claim_cols = jnp.broadcast_to(tok_idx[:, lo:lo + step], (B, step))
        last_claim = jax.vmap(lambda lc, sl, ci: lc.at[sl].set(ci))(
            last_claim, jnp.where(stored_p, plan.slots, junk), claim_cols)
        last_claim = last_claim.at[:, junk].set(-1)

        # visibility of CACHE columns for this step's queries = exactly
        # what the step's production pass computes (per query token), minus
        # columns already overwritten by chunk steps 0..p (their
        # replacement keys live in-flight). `written` includes this step's
        # own slots — production has them in-cache (write-then-attend); the
        # verify pass scores them from the in-flight block instead.
        if use_hf:
            ref_idx, q_cap = reference_mask_operands(plan, sink_slots=sink)
            vis = ((ref_idx[:, None, :] >= 0)
                   & (ref_idx[:, None, :] <= q_cap[:, :, None]))
        else:
            vis = ((plan.new_order[:, None, :] >= 0)
                   & (plan.new_order[:, None, :] <= plan.g[:, :, None]))
        # (junk writes excluded: invisible anyway, and under the static
        # policy the old junk content must stay invisible)
        written = written | jnp.any(
            jax.nn.one_hot(jnp.where(stored_p, plan.slots, junk), W1,
                           dtype=jnp.bool_)
            & stored_p[..., None], axis=1)
        cache_masks.append(vis & ~written[:, None, :])         # [B, step, W+1]

        # in-flight columns: sequential step p sees chunk token i of steps
        # <= p iff token i was actually stored (slot != junk; the static
        # policy freezes its prefix and never sees later tokens), still
        # owns its slot, and passes the step's visibility formula. A valid
        # token on a non-junk slot sees itself, exactly like the production
        # write-then-attend pass; static-policy and invalid tokens go to
        # junk and stay invisible even to themselves — parity with the
        # production pass, which leaves such rows attending the cache only.
        owns = (jnp.take_along_axis(last_claim, slots_all, axis=1)
                == tok_idx)                                    # [B, T]
        base = stored_all & owns
        if use_hf:
            evicted = (plan.new_seen - plan.new_length)[:, None]   # [B, 1]
            ref_i = g_all - jnp.where(slots_all >= sink, evicted, 0)
            form = ref_i[:, None, :] <= q_cap[:, :, None]
        else:
            form = g_all[:, None, :] <= plan.g[:, :, None]
        infl_masks.append(base[:, None, :] & form)             # [B, step, T]

        meta = dataclasses.replace(
            meta, key_pos=plan.new_key_pos, order=plan.new_order,
            seen=plan.new_seen, length=plan.new_length)
        metas.append((plan.new_key_pos, plan.new_order,
                      plan.new_seen, plan.new_length))

    cat1 = lambda xs: jnp.concatenate(xs, axis=1)
    return SpecPlans(
        slots=cat1(slots), g=cat1(gs), q_pos=cat1(q_poss),
        write_pos=cat1(write_poss), valid=cat1(valids),
        cache_mask=cat1(cache_masks),
        infl_mask=cat1(infl_masks),
        meta_key_pos=jnp.stack([m[0] for m in metas]),
        meta_order=jnp.stack([m[1] for m in metas]),
        meta_seen=jnp.stack([m[2] for m in metas]),
        meta_length=jnp.stack([m[3] for m in metas]),
        qx=cat1(qxs), dpos=dpos, exact=exact,
    )


def build_draft_hist(ctx_ids: jnp.ndarray | None,   # [B, C] or None
                     ctx_len: jnp.ndarray | None,   # [B] valid ctx lengths
                     ids: jnp.ndarray,               # [B, P] prompt ids
                     lens: jnp.ndarray,              # [B] valid prompt lengths
                     extra: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Contiguous n-gram draft history for ``ngram_draft``: [context]
    [prompt] [room for `extra` generated tokens], ragged rows packed left,
    -1 in unused columns (never matches a real token id). Returns
    ``(hist [B, C+P+extra] int32, hist_len [B] int32)``."""
    B, P = ids.shape
    C = 0 if ctx_ids is None else ctx_ids.shape[1]
    bidx = jnp.arange(B)
    hist = jnp.full((B, C + P + extra), -1, jnp.int32)
    if C:
        ccols = jnp.arange(C, dtype=jnp.int32)[None, :]
        hist = hist.at[:, :C].set(
            jnp.where(ccols < ctx_len[:, None], ctx_ids.astype(jnp.int32), -1))
        off = ctx_len.astype(jnp.int32)
    else:
        off = jnp.zeros((B,), jnp.int32)
    cols = jnp.arange(P, dtype=jnp.int32)[None, :]
    hist = hist.at[bidx[:, None], off[:, None] + cols].set(
        jnp.where(cols < lens[:, None], ids.astype(jnp.int32), -1),
        mode="drop")
    return hist, off + lens.astype(jnp.int32)


def ngram_draft(hist: jnp.ndarray,      # [B, M] token history, -1 = empty
                hist_len: jnp.ndarray,  # [B] valid prefix length
                carry: jnp.ndarray,     # [B] next token to be written
                n_draft: int) -> jnp.ndarray:
    """Self-drafting by n-gram lookup (prompt-lookup decoding): propose the
    continuation that followed the most recent earlier occurrence of the
    LONGEST matching suffix — trigram (prev, last, carry) first, then
    bigram (last, carry), then unigram (carry); no match -> zeros. Longer
    keys disambiguate repeated tokens (precision), shorter keys keep
    recall. Drafts are PROPOSALS only — the verify pass accepts exactly
    the prefix that matches sequential greedy argmax, so draft quality
    affects speed, never correctness.

    All ops are [B, M] elementwise/argmax — negligible next to one decoder
    pass. `hist` must be contiguous (prompt then generated tokens, no gap)
    with unused columns -1 so they can never match a real token id.
    Returns drafts [B, n_draft] int32.
    """
    B, M = hist.shape
    # place carry at hist[hist_len]: the sequence suffix ends ...last, carry
    bidx = jnp.arange(B)
    h = hist.at[bidx, jnp.minimum(hist_len, M - 1)].set(carry)
    L = hist_len + 1                                   # [B] length incl. carry
    idx = jnp.arange(M, dtype=jnp.int32)[None, :]      # [1, M]
    key_c = h[bidx, jnp.maximum(L - 3, 0)]             # token before last
    key_a = h[bidx, jnp.maximum(L - 2, 0)]             # last written token
    key_b = carry

    def latest(match):                                  # [B, M] -> [B], -1 none
        return jnp.max(jnp.where(match, idx, -1), axis=1)

    nxt = jnp.concatenate([h[:, 1:], jnp.full((B, 1), -1, h.dtype)], axis=1)
    nxt2 = jnp.concatenate([h[:, 2:], jnp.full((B, 2), -1, h.dtype)], axis=1)
    # trigram: h[j] == key_c & h[j+1] == key_a & h[j+2] == key_b,
    # continuation starts at j+3 (j+2 < L-1 excludes the suffix itself)
    m3 = ((h == key_c[:, None]) & (nxt == key_a[:, None])
          & (nxt2 == key_b[:, None])
          & (idx + 3 < L[:, None]) & (L[:, None] >= 3))
    j3 = latest(m3)
    # bigram: h[j] == key_a & h[j+1] == key_b, continuation starts at j+2
    m2 = ((h == key_a[:, None]) & (nxt == key_b[:, None])
          & (idx + 2 < L[:, None]) & (L[:, None] >= 2))
    j2 = latest(m2)
    # unigram: h[j] == carry, continuation starts at j+1
    m1 = (h == key_b[:, None]) & (idx + 1 < L[:, None])
    j1 = latest(m1)
    start = jnp.where(j3 >= 0, j3 + 3,
                      jnp.where(j2 >= 0, j2 + 2,
                                jnp.where(j1 >= 0, j1 + 1, M)))   # [B]
    pos = start[:, None] + jnp.arange(n_draft, dtype=jnp.int32)[None, :]
    ok = pos < L[:, None]
    drafts = jnp.take_along_axis(h, jnp.clip(pos, 0, M - 1), axis=1)
    return jnp.where(ok & (drafts >= 0), drafts, 0).astype(jnp.int32)


def select_meta(cache: KVCache, plans: SpecPlans,
                m_cache: jnp.ndarray) -> KVCache:
    """Jump each row's metadata to the state after its accepted m_cache
    (in [0, S]) sequential steps."""
    def pick(stack):  # [S+1, B, ...] -> [B, ...]
        idx = m_cache.reshape(1, -1, *([1] * (stack.ndim - 2)))
        return jnp.take_along_axis(stack, idx, axis=0)[0]

    return dataclasses.replace(
        cache,
        key_pos=pick(plans.meta_key_pos), order=pick(plans.meta_order),
        seen=pick(plans.meta_seen), length=pick(plans.meta_length))


def commit_slots(cache: KVCache, plans: SpecPlans,
                 infl_k: jnp.ndarray,    # [L, B, S, KVH, Dh] (pre-rotated)
                 infl_v: jnp.ndarray,
                 m_cache: jnp.ndarray,   # [B] accepted chunk tokens (0..S)
                 junk: int) -> KVCache:
    """Scatter the accepted tokens' K/V into their planned slots.

    Runs as a lax.scan over layers with the cache streamed through xs/ys —
    the formulation XLA aliases fully in place (see module docstring).
    Rejected columns route to the junk slot. int8 KV caches quantize the
    in-flight block here (per-(token, head) scales, like write_layer).
    """
    S = infl_k.shape[2]
    keep = jnp.arange(S, dtype=jnp.int32)[None, :] < m_cache[:, None]
    slots = jnp.where(keep & plans.valid, plans.slots, junk)   # [B, S]

    quant = cache.k.dtype == jnp.int8
    if quant:
        ks_new, k_sc = jax.vmap(quantize_kv)(infl_k)   # over L
        vs_new, v_sc = jax.vmap(quantize_kv)(infl_v)
    else:
        ks_new, vs_new = infl_k, infl_v
        k_sc = v_sc = None

    def scat(buf, val):
        # buf [B, W+1, ...], val [B, S, ...]
        return jax.vmap(lambda b, i, s: b.at[i].set(s))(buf, slots, val)

    def body(_, xs):
        if quant:
            kc, vc, kn, vn, ksc, vsc, kscn, vscn = xs
            return None, (scat(kc, kn), scat(vc, vn),
                          scat(ksc, kscn), scat(vsc, vscn))
        kc, vc, kn, vn = xs
        return None, (scat(kc, kn), scat(vc, vn))

    if quant:
        _, (k, v, ksc, vsc) = jax.lax.scan(
            body, None, (cache.k, cache.v, ks_new, vs_new,
                         cache.k_scale, cache.v_scale, k_sc, v_sc))
        return dataclasses.replace(cache, k=k, v=v, k_scale=ksc, v_scale=vsc)
    _, (k, v) = jax.lax.scan(body, None, (cache.k, cache.v, ks_new, vs_new))
    return dataclasses.replace(cache, k=k, v=v)

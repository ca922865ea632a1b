"""Greedy + speculative generation (split out of engine.py in round 5).
`make_generate(...)` returns the decode loops the engine jits; see
engine_core for the split rationale. Reference:
`fast_greedy_generate` at `/root/reference/models/modeling_live.py:64-90`.
"""

from __future__ import annotations

import os as _os_mod
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from aha_tpu.models import qwen2
from aha_tpu.ops import spec_decode


# Acceptance-adaptive speculation: a spec pass at width S commits 1..S
# tokens per decoding row; the committed fraction (normalized by the
# pass's ACHIEVABLE tokens) feeds a batch-scalar EMA, and while the EMA
# exceeds the HI threshold the next pass widens to spec_max (both widths
# live in the program behind a lax.cond); the width drops back as soon
# as acceptance fades. Defaults tuned on the v5e-1 7B int8 worst-case QA
# A/B (scripts/perf/ab_spec_adaptive.py, BASELINE.md round 4): HI=0.7 +
# alpha=0.35 enter the wide tail fast enough to capture 96% of fixed
# S=8's full-acceptance ceiling (24.95 vs 25.92 agg fps; 0.8/0.25 left
# 8% on the table) while a 33%-acceptance workload reads EMA ~0.62 and
# stays safely narrow (12.42 — the best arm there too). Env overrides
# for sweeps.
_SPEC_EMA_ALPHA = float(_os_mod.environ.get("AHA_SPEC_EMA_ALPHA", 0.35))
_SPEC_EMA_HI = float(_os_mod.environ.get("AHA_SPEC_EMA_HI", 0.7))


def _apply_repetition_penalty(logits: jnp.ndarray, counts: jnp.ndarray, penalty: float | None):
    """RepetitionPenaltyLogitsProcessor semantics over a per-vocab count mask
    (ref: modeling_live.py:66-82): penalized tokens are those generated before;
    positive logits are divided by the penalty, negative multiplied."""
    if penalty is None:
        return logits
    mask = counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(mask, penalized, logits)


def make_generate(core, cfg, policy, lora, lora_scale: float,
                  spec_tokens: int, spec_max: int, max_new_tokens: int,
                  repetition_penalty: float | None) -> SimpleNamespace:
    append_ids = core.append_ids

    def generate(params, cache, prompt_ids, valid_len, counts, active=None):
        """Greedy decode (ref fast_greedy_generate). Returns
        (cache, out_ids [B, N], out_len [B], counts). Rows with
        active=False are no-ops: their prompt is skipped (valid_len
        forced to 0 -> junk slot) and they never emit or penalize a
        token — the multi-stream path generates for the triggered
        subset of a batch this way."""
        eos = cfg.eos_token_id
        N = max_new_tokens
        B = prompt_ids.shape[0]
        if active is not None:
            valid_len = jnp.where(active, valid_len, 0)
        cache, logits = append_ids(params, cache, prompt_ids, valid_len)
        tok = jnp.argmax(
            _apply_repetition_penalty(logits, counts, repetition_penalty), axis=-1
        ).astype(jnp.int32)

        out_ids = jnp.zeros((B, N), jnp.int32)
        out_len = jnp.zeros((B,), jnp.int32)
        done = (jnp.zeros((B,), bool) if active is None else ~active)

        def cond(state):
            i, _, _, _, _, done, _ = state
            return (i < N) & ~jnp.all(done)

        def body(state):
            i, tok, cache, out_ids, out_len, done, counts = state
            # write current token (including the eos that terminates a row)
            write = ~done
            out_ids = out_ids.at[:, i].set(jnp.where(write, tok, 0))
            out_len = out_len + write.astype(jnp.int32)
            is_eos = tok == eos
            # eos is never penalized (ref modeling_live.py:82)
            upd = write & ~is_eos
            counts = counts.at[jnp.arange(B), tok].add(upd.astype(jnp.int32))
            done = done | is_eos
            # one decoder step for still-active rows (finished rows write
            # zero valid tokens: the junk slot absorbs them). The ref
            # never feeds the final written token back through the model
            # (fast_greedy_generate breaks before the embed update and the
            # range loop ends after the write, modeling_live.py:64-90); it
            # re-enters as the next chunk's leading id instead.
            embeds = qwen2.embed_tokens(params["llm"], tok, dtype=jnp.dtype(cfg.dtype))[:, None, :]
            step_valid = (~done & (i + 1 < N)).astype(jnp.int32)
            hidden, cache = qwen2.decode_chunk(
                params["llm"], cfg.llm, policy, cache, embeds, step_valid,
                lora=lora, lora_scale=lora_scale,
            )
            logits = qwen2.lm_logits(params["llm"], cfg.llm, hidden[:, 0]).astype(jnp.float32)
            tok = jnp.argmax(
                _apply_repetition_penalty(logits, counts, repetition_penalty), axis=-1
            ).astype(jnp.int32)
            return (i + 1, tok, cache, out_ids, out_len, done, counts)

        state = (jnp.int32(0), tok, cache, out_ids, out_len, done, counts)
        _, _, cache, out_ids, out_len, _, counts = jax.lax.while_loop(cond, body, state)
        last_tok = out_ids[jnp.arange(B), jnp.maximum(out_len - 1, 0)]
        return cache, out_ids, out_len, counts, last_tok

    def generate_spec(params, cache, prompt_ids, valid_len, counts,
                      active=None, ctx_ids=None, ctx_len=None,
                      ema0=None):
        """Speculative greedy decode: EXACT output parity with
        `generate` (the reference's strictly sequential loop), but each
        weight stream verifies S = spec_tokens candidate tokens —
        the carried token plus S-1 n-gram-lookup drafts
        (`spec_decode.ngram_draft`) — via the read-only verify pass
        (`qwen2.decode_chunk_spec`), committing only the prefix that
        matches sequential greedy argmax. Motivation (BASELINE.md round
        3): batched decode runs within ~2x of the chip's weight-stream
        limit, so the remaining lever is tokens per weight stream.

        Exactness: position p's hidden state bit-matches the p-th
        sequential 1-token pass for every cache policy/fill state
        (tests/test_spec_decode.py); acceptance replays the sequential
        loop's write/eos/budget/repetition-penalty bookkeeping per
        position, so a rejected draft costs nothing but the pass and a
        perfect drafter changes no output byte.

        ctx_ids/ctx_len: optional draft CONTEXT ([B, C] int32 + [B]
        valid lengths) — recent conversation text (queries, earlier
        responses) prepended to the lookup history. Answers that
        quote the asked question are prompt-lookup's sweet spot, so
        this is where real-checkpoint acceptance comes from. Pure
        draft source: never fed to the model, cannot change output.
        """
        S_lo = spec_tokens
        S_hi = spec_max
        eos = cfg.eos_token_id
        N = max_new_tokens
        B = prompt_ids.shape[0]
        P = prompt_ids.shape[1]
        C = 0 if ctx_ids is None else ctx_ids.shape[1]
        M = C + P + N + 1
        if active is not None:
            valid_len = jnp.where(active, valid_len, 0)
        cache, logits = append_ids(params, cache, prompt_ids, valid_len)
        tok = jnp.argmax(
            _apply_repetition_penalty(logits, counts, repetition_penalty), axis=-1
        ).astype(jnp.int32)

        bidx = jnp.arange(B)
        out_ids = jnp.zeros((B, N), jnp.int32)
        out_len = jnp.zeros((B,), jnp.int32)
        done = (jnp.zeros((B,), bool) if active is None else ~active)
        # contiguous draft-source history: [context] [prompt] [generated],
        # -1 in unused columns (never matches a real id)
        hist, hist_len = spec_decode.build_draft_hist(
            ctx_ids, ctx_len, prompt_ids, valid_len, N + 1)

        def cond(state):
            out_len, done = state[3], state[4]
            return jnp.any(~done & (out_len < N))

        def body_for(S):
            def body(state):
                (tok, cache, out_ids, out_len, done, counts, hist,
                 hist_len, ema, passes, acc) = state
                out_len0 = out_len
                drafts = spec_decode.ngram_draft(hist, hist_len, tok, S - 1)
                chunk = jnp.concatenate([tok[:, None], drafts], axis=1)  # [B, S]
                rows = ~done & (out_len < N)
                plan_valid = jnp.where(rows, S, 0).astype(jnp.int32)
                plans = spec_decode.plan_compose(cache, policy, plan_valid, S)
                embeds = qwen2.embed_tokens(
                    params["llm"], chunk, dtype=jnp.dtype(cfg.dtype))
                hidden, infl_k, infl_v = qwen2.decode_chunk_spec(
                    params["llm"], cfg.llm, policy, cache, embeds, plans,
                    lora=lora, lora_scale=lora_scale)
                logits = qwen2.lm_logits(
                    params["llm"], cfg.llm, hidden).astype(jnp.float32)  # [B, S, V]

                # replay the sequential loop's bookkeeping position by
                # position (S is small and static — this unrolls at trace
                # time into [B]-sized ops, no extra device passes)
                reach = rows                    # position p reached + writable
                m_cache = jnp.zeros((B,), jnp.int32)
                carry = tok
                for p in range(S):
                    tok_p = chunk[:, p]
                    write = reach
                    out_ids = out_ids.at[
                        bidx, jnp.where(write, out_len, N)].set(tok_p, mode="drop")
                    hist = hist.at[
                        bidx, jnp.where(write, hist_len, M)].set(tok_p, mode="drop")
                    out_len = out_len + write
                    hist_len = hist_len + write
                    is_eos = tok_p == eos
                    counts = counts.at[bidx, tok_p].add(
                        (write & ~is_eos).astype(jnp.int32))
                    done = done | (write & is_eos)
                    # the decoder step for tok_p ran speculatively; it COUNTS
                    # iff the sequential loop would have run it
                    processed = write & ~is_eos & (out_len < N)
                    m_cache = m_cache + processed
                    t_next = jnp.argmax(_apply_repetition_penalty(
                        logits[:, p], counts, repetition_penalty),
                        axis=-1).astype(jnp.int32)
                    carry = jnp.where(processed, t_next, carry)
                    if p + 1 < S:
                        # draft p+1 is accepted iff it IS the sequential token
                        reach = processed & (chunk[:, p + 1] == t_next)

                cache = spec_decode.commit_slots(
                    cache, plans, infl_k, infl_v, m_cache, policy.junk)
                cache = spec_decode.select_meta(cache, plans, m_cache)
                # acceptance EMA + counters (speed-only state: outputs
                # are width-independent by the exactness contract).
                # Normalize by ACHIEVABLE tokens — a row whose budget
                # ends mid-chunk cannot commit full width, and counting
                # that as rejection under-reads acceptance (measured:
                # the full-acceptance ceiling read EMA 0.67 at S=8 and
                # kept dropping the adaptive tail out of wide passes)
                committed = jnp.sum(out_len - out_len0)
                achievable = jnp.maximum(jnp.sum(jnp.where(
                    rows, jnp.minimum(S, N - out_len0), 0)), 1)
                frac = committed.astype(jnp.float32) / achievable
                ema = (1.0 - _SPEC_EMA_ALPHA) * ema + _SPEC_EMA_ALPHA * frac
                return (carry, cache, out_ids, out_len, done, counts,
                        hist, hist_len, ema, passes + 1, acc + committed)
            return body

        if S_hi > S_lo:
            body_lo, body_hi = body_for(S_lo), body_for(S_hi)

            def body(state):
                return jax.lax.cond(state[8] > _SPEC_EMA_HI,
                                    body_hi, body_lo, state)
        else:
            body = body_for(S_lo)

        state = (tok, cache, out_ids, out_len, done, counts, hist,
                 hist_len,
                 (jnp.float32(0.0) if ema0 is None
                  else jnp.asarray(ema0, jnp.float32)),
                 jnp.int32(0), jnp.int32(0))
        (_, cache, out_ids, out_len, _, counts, _, _, ema, passes,
         acc) = jax.lax.while_loop(cond, body, state)
        last_tok = out_ids[jnp.arange(B), jnp.maximum(out_len - 1, 0)]
        # spec_info [3] f32: passes, committed tokens, acceptance EMA
        spec_info = jnp.stack([passes.astype(jnp.float32),
                               acc.astype(jnp.float32), ema])
        return cache, out_ids, out_len, counts, last_tok, spec_info

    return SimpleNamespace(generate=generate, generate_spec=generate_spec)

"""The fused serving iteration (split out of engine.py in round 5): the
mixed scoring+generation while_loop (`_mixed_loop`) and the one-program
serving step (`serve_step`) built on the core/trigger/generate factories.
See engine_core for the split rationale.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from aha_tpu.models import qwen2
from aha_tpu.ops import spec_decode
from aha_tpu.streaming.engine_core import _last_valid, _scores_from_hidden
from aha_tpu.streaming.engine_generate import (_SPEC_EMA_ALPHA, _SPEC_EMA_HI,
                                               _apply_repetition_penalty)


def make_serve(core, trigger, gen, cfg, policy, lora, lora_scale: float,
               fused_frames: int, spec_tokens: int, spec_max: int,
               max_new_tokens: int, repetition_penalty: float | None,
               serve_overlap: bool) -> SimpleNamespace:
    append_text_frames = core.append_text_frames
    z_step = core.z_step
    _fused_frames_pass = core.fused_frames_pass
    trigger_loop_impl = trigger.trigger_loop_impl
    generate = gen.generate
    generate_spec = gen.generate_spec

    def _mixed_loop(params, cache, frames, start, limit, score_sum,
                    triggered0, scores_buf, prob_threshold, sum_threshold,
                    head_mask, gen_ids, gen_len, counts, z_thr, z_hist,
                    z_cnt, first_n, resume_at, ctx_ids=None,
                    ctx_len=None, ema0=None, retire_defer=None):
        """Trigger scoring AND greedy generation in ONE while_loop: a
        row that triggers switches to decoding INLINE while the other
        rows keep scoring frames — batch rows are independent sessions
        (per-row cache slices, no cross-row attention), so this is a
        pure scheduling change: every row's token sequence, cache
        writes, and scores are identical to the freeze-then-generate
        path, but the B-1 non-triggered rows no longer idle through a
        ~W-passes-long decode (each decode pass is a full weight
        stream from HBM that previously advanced ONLY the triggered
        rows; serving measurement in BASELINE.md round 3).

        Per-row state machine: 0 = scoring frames, 1 = triggered (next
        pass appends the generation prompt), 2 = decoding, 3 = waiting
        for the loop to exit. The loop exits whenever no generation is
        in flight AND some row needs host attention (a finished
        response, or a row that newly hit its frame limit — the
        early-exit that keeps continuous-batching slots refillable);
        while a generation IS in flight the loop always continues, so
        the other rows keep scoring through it.

        Decode passes share the scoring rows' chunk width (F frame
        tokens), so a gen-only tail pass pays ~F x the 1-token matmul
        FLOPs; at serving batch sizes the pass stays dominated by the
        weight stream it shares with the scoring rows, which is the
        point.

        Exact generate() emulation for modes 1/2 (same argmax /
        repetition-penalty / eos-not-penalized order, and the final
        token is never fed back through the model — ref
        modeling_live.py:64-90).

        Speculative decode tail (S = spec_tokens > 1): once every live
        row is decoding (no scoring or prompt rows — the common tail
        of a response round), passes switch to an S-token verify chunk
        (`spec_tail`): the carried token plus S-1 n-gram-lookup drafts
        verified in ONE weight stream, committing exactly the prefix
        that matches sequential greedy argmax — measured free when
        rejected, up to S x when accepted (BASELINE.md round 3).
        Per-row outputs and cache state stay byte-identical.

        Returns (cache, scores_buf, i, score_sum, triggered, out_ids,
        out_len, counts, last_tok)."""
        eos = cfg.eos_token_id
        N = max_new_tokens
        B, T = frames.shape[:2]
        F = frames.shape[2]
        Pg = gen_ids.shape[1]
        W = max(F, Pg)
        S = spec_tokens
        S_hi = spec_max
        C = 0 if ctx_ids is None else ctx_ids.shape[1]
        Mh = C + Pg + N + 1
        bidx = jnp.arange(B)
        gen_emb = qwen2.embed_tokens(params["llm"], gen_ids,
                                     dtype=jnp.dtype(cfg.dtype))
        if Pg < W:
            gen_emb = jnp.pad(gen_emb, ((0, 0), (0, W - Pg), (0, 0)))

        mode0 = jnp.where(triggered0, 1,
                          jnp.where(start < limit, 0, 3)).astype(jnp.int32)
        # n-gram draft history for the speculative tail: [recent
        # conversation text (ctx)] [generation prompt] [generated
        # tokens], -1 padding (never matches a real id). At S == 1
        # there is no drafting: carry token-sized placeholders,
        # untouched (a while-loop carry costs nothing) — the scatter
        # per decode pass would not.
        if S > 1:
            hist0, hlen0 = spec_decode.build_draft_hist(
                ctx_ids, ctx_len, gen_ids, gen_len.astype(jnp.int32),
                N + 1)
        else:
            hist0 = jnp.zeros((B, 1), jnp.int32)
            hlen0 = jnp.zeros((B,), jnp.int32)

        # batched retirement (VERDICT r3 next #8): a row that hits its
        # frame limit normally asks for host attention immediately (one
        # host RTT per retirement — slots refill at once). retire_defer
        # = m keeps the loop on device until >= m rows wait, trading
        # idle slot time on the waiting rows for fewer dispatches on
        # retirement-heavy ragged workloads. 1 (default) = historical
        # behavior; responses always exit (their text must reach the
        # host before the row's next frame — reference semantics).
        rd = (jnp.int32(1) if retire_defer is None
              else jnp.asarray(retire_defer, jnp.int32))

        def cond(state):
            mode, resp_done, new_wait = state[4], state[10], state[11]
            live = mode != 3
            gen_live = (mode == 1) | (mode == 2)
            nw = jnp.sum(new_wait.astype(jnp.int32))
            need_host = jnp.any(resp_done) | (nw >= rd)
            return jnp.any(live) & ~(need_host & ~jnp.any(gen_live))

        def seq_pass(state):
            (i, cache, scores_buf, score_sum, mode, tok, out_ids,
             out_len, counts, triggered, resp_done, new_wait,
             zh, zc, hist, hist_len, ema, passes, acc) = state

            # 3. one ragged mixed chunk: frames / gen prompt / one
            # token. Two widths behind a cond: once every scoring row
            # waits (the common decode tail), passes drop to the
            # prompt width instead of paying the F-token pad.
            tok_emb1 = qwen2.embed_tokens(
                params["llm"], tok[:, None], dtype=jnp.dtype(cfg.dtype))
            idx = jnp.clip(i, 0, T - 1)

            def run(width, with_frames, cache):
                if with_frames:
                    fe = frames[jnp.arange(B), idx]       # [B, F, H]
                    if F < width:
                        fe = jnp.pad(fe, ((0, 0), (0, width - F), (0, 0)))
                ge = gen_emb[:, :width]   # gen_emb pre-padded to W
                te = jnp.pad(tok_emb1, ((0, 0), (0, width - 1), (0, 0)))
                m = mode[:, None, None]
                emb = jnp.where(m == 1, ge, te)
                if with_frames:
                    emb = jnp.where(m == 0, fe, emb)
                valid = jnp.select(
                    [mode == 0, mode == 1, mode == 2],
                    [jnp.full((B,), F if with_frames else 0, jnp.int32),
                     gen_len.astype(jnp.int32),
                     jnp.ones((B,), jnp.int32)],
                    jnp.zeros((B,), jnp.int32))
                hidden, cache = qwen2.decode_chunk(
                    params["llm"], cfg.llm, policy, cache, emb, valid,
                    lora=lora, lora_scale=lora_scale,
                )
                return cache, _last_valid(hidden, valid)

            # two widths: mixed/prompt passes run at W = max(F, Pg)
            # (a prompt pass is one per response — riding the wide
            # branch keeps the program at ONE cond); the decode tail
            # runs at width 1 (64 of 65 gen-only passes for a
            # 64-token answer — one token's matmuls + the weight
            # stream, same pass cost as generate()'s). At S > 1 the
            # spec_tail branch owns the pure-decode case (body-level
            # cond), so seq_pass always runs wide.
            if S > 1:
                cache, last_h = run(W, True, cache)
            elif W == 1:
                cache, last_h = run(1, True, cache)
            else:
                cache, last_h = jax.lax.cond(
                    jnp.any((mode == 0) | (mode == 1)),
                    lambda c: run(W, True, c),
                    lambda c: run(1, False, c), cache)

            # 4. scoring rows: trigger rule on this frame's scores
            s = _scores_from_hidden(params, cfg, last_h).astype(jnp.float32)
            scored = mode == 0
            scores_buf = jnp.where(
                scored[:, None, None]
                & (jnp.arange(T)[None, :, None] == idx[:, None, None]),
                s[:, None, :], scores_buf)
            stream_end = s[:, 0] * head_mask[0] + s[:, 1] * head_mask[1]
            new_sum = score_sum + jnp.where(scored, stream_end, 0.0)
            ok = scored & (i >= resume_at)
            sum_hit = ok & (new_sum > sum_threshold)
            prob_hit = ok & (stream_end > prob_threshold)
            zh, zc, z_hit = z_step(zh, zc, stream_end, scored, z_thr,
                                   first_n)
            z_hit = z_hit & ok
            score_sum = jnp.where(sum_hit, 0.0, new_sum)
            fire = sum_hit | prob_hit | z_hit
            i = i + scored.astype(jnp.int32)
            triggered = triggered | fire

            # 5. lm head only when some row decodes (skipping it keeps
            # pure-scoring passes free of the lm_head weight stream)
            def with_lm(op):
                last_h_, counts_ = op
                logits = qwen2.lm_logits(
                    params["llm"], cfg.llm, last_h_).astype(jnp.float32)
                return jnp.argmax(_apply_repetition_penalty(
                    logits, counts_, repetition_penalty),
                    axis=-1).astype(jnp.int32)

            decoding = (mode == 1) | (mode == 2)
            next_tok = jax.lax.cond(
                jnp.any(decoding), with_lm,
                lambda op: jnp.zeros((B,), jnp.int32), (last_h, counts))
            tok = jnp.where(decoding, next_tok, tok)

            # 6. tail-write the token this pass just produced (exactly
            # generate()'s write/eos/counts order) and detect stops
            # HERE, so cond sees them and the loop never spends a
            # weight pass on all-invalid rows
            j = jnp.minimum(out_len, N - 1)
            out_ids = jnp.where(
                decoding[:, None]
                & (jnp.arange(N)[None, :] == j[:, None]),
                tok[:, None], out_ids)
            out_len = out_len + decoding.astype(jnp.int32)
            if S > 1:   # S == 1 never drafts: skip the per-pass scatter
                hist = hist.at[
                    bidx, jnp.where(decoding, hist_len, Mh)].set(
                    tok, mode="drop")
                hist_len = hist_len + decoding.astype(jnp.int32)
            is_eos = decoding & (tok == eos)
            pen = decoding & ~(tok == eos)
            counts = counts.at[jnp.arange(B), tok].add(pen.astype(jnp.int32))
            stop = decoding & (is_eos | (out_len >= N))
            resp_done = resp_done | stop
            mode = jnp.where(mode == 1, 2, mode)   # prompt done -> decode
            mode = jnp.where(stop, 3, mode)        # response finished
            mode = jnp.where(fire, 1, mode)        # trigger -> prompt next
            # scoring rows that reached their limit wait (and ask for
            # an exit once nothing is generating: retire/admit)
            lim_hit = (mode == 0) & (i >= limit)
            new_wait = new_wait | lim_hit
            mode = jnp.where(lim_hit, 3, mode)

            return (i, cache, scores_buf, score_sum, mode, tok, out_ids,
                    out_len, counts, triggered, resp_done, new_wait,
                    zh, zc, hist, hist_len, ema, passes, acc)

        def spec_tail_for(Sw):
            """Pure-decode pass at width Sw: verify the carried token
            plus Sw-1 n-gram drafts in ONE weight stream (the
            generate_spec machinery re-based on the mixed loop's
            written-but-unfed carry: `tok` is already in out_ids/hist/
            counts, so feeding chunk position p tail-writes the NEXT
            token t_{p+1} with exactly seq_pass's write/eos/budget
            order). Entered only when no row scores or prompts.
            Parametrized by width for the acceptance-adaptive switch
            (S vs spec_max behind a lax.cond on the acceptance EMA —
            outputs are width-independent, only speed changes)."""
            def spec_tail(state):
                (i, cache, scores_buf, score_sum, mode, tok, out_ids,
                 out_len, counts, triggered, resp_done, new_wait,
                 zh, zc, hist, hist_len, ema, passes, acc) = state
                out_len0 = out_len
                decoding = mode == 2
                # the carry is already written, so the lookup anchors one
                # position back (ngram_draft re-places it at hist_len - 1)
                drafts = spec_decode.ngram_draft(
                    hist, jnp.maximum(hist_len - 1, 0), tok, Sw - 1)
                chunk = jnp.concatenate([tok[:, None], drafts], axis=1)
                plan_valid = jnp.where(decoding, Sw, 0).astype(jnp.int32)
                plans = spec_decode.plan_compose(cache, policy,
                                                 plan_valid, Sw)
                embeds = qwen2.embed_tokens(
                    params["llm"], chunk, dtype=jnp.dtype(cfg.dtype))
                hidden, infl_k, infl_v = qwen2.decode_chunk_spec(
                    params["llm"], cfg.llm, policy, cache, embeds, plans,
                    lora=lora, lora_scale=lora_scale)
                logits = qwen2.lm_logits(
                    params["llm"], cfg.llm, hidden).astype(jnp.float32)

                reach = decoding          # feed of chunk[:, p] would run
                m_cache = jnp.zeros((B,), jnp.int32)
                for p in range(Sw):
                    m_cache = m_cache + reach.astype(jnp.int32)
                    t_next = jnp.argmax(_apply_repetition_penalty(
                        logits[:, p], counts, repetition_penalty),
                        axis=-1).astype(jnp.int32)
                    write = reach
                    out_ids = out_ids.at[
                        bidx, jnp.where(write, out_len, N)].set(
                        t_next, mode="drop")
                    hist = hist.at[
                        bidx, jnp.where(write, hist_len, Mh)].set(
                        t_next, mode="drop")
                    out_len = out_len + write.astype(jnp.int32)
                    hist_len = hist_len + write.astype(jnp.int32)
                    is_eos = t_next == eos
                    counts = counts.at[bidx, t_next].add(
                        (write & ~is_eos).astype(jnp.int32))
                    stop = write & (is_eos | (out_len >= N))
                    resp_done = resp_done | stop
                    mode = jnp.where(stop, 3, mode)
                    tok = jnp.where(write, t_next, tok)
                    if p + 1 < Sw:
                        # draft p+1 is fed next iff it IS the token the
                        # sequential loop just produced and nothing stopped
                        reach = write & ~stop & (chunk[:, p + 1] == t_next)

                cache = spec_decode.commit_slots(
                    cache, plans, infl_k, infl_v, m_cache, policy.junk)
                cache = spec_decode.select_meta(cache, plans, m_cache)
                # EMA normalized by ACHIEVABLE tokens (budget-capped
                # rows cannot commit full width — see generate_spec)
                committed = jnp.sum(out_len - out_len0)
                achievable = jnp.maximum(jnp.sum(jnp.where(
                    decoding, jnp.minimum(Sw, N - out_len0), 0)), 1)
                frac = committed.astype(jnp.float32) / achievable
                ema = (1.0 - _SPEC_EMA_ALPHA) * ema + _SPEC_EMA_ALPHA * frac
                return (i, cache, scores_buf, score_sum, mode, tok,
                        out_ids, out_len, counts, triggered, resp_done,
                        new_wait, zh, zc, hist, hist_len, ema,
                        passes + 1, acc + committed)
            return spec_tail

        k = fused_frames

        def fused_score_pass(state):
            """Pure-scoring pass at k frames per weight stream
            (_fused_frames_pass) — entered only when no row is
            prompting or decoding, the dominant phase of
            trigger-sparse serving. Per-row transitions replicate
            seq_pass's scoring arm exactly (trigger -> prompt next
            pass; limit -> wait + ask for host attention)."""
            (i, cache, scores_buf, score_sum, mode, tok, out_ids,
             out_len, counts, triggered, resp_done, new_wait,
             zh, zc, hist, hist_len, ema, passes, acc) = state
            act = mode == 0
            jk = jnp.arange(k, dtype=jnp.int32)
            cache, s, A, fire, score_sum, zh, zc = _fused_frames_pass(
                params, cache, frames, i, act, limit, score_sum,
                prob_threshold, sum_threshold, head_mask, z_thr, zh, zc,
                first_n, resume_at)
            keep = jk[None, :] < A[:, None]
            pos = i[:, None] + jk[None, :]
            scores_buf = scores_buf.at[
                bidx[:, None], jnp.where(keep, pos, T)].set(
                s, mode="drop")
            i = i + A
            triggered = triggered | fire
            mode = jnp.where(fire, 1, mode)      # trigger -> prompt next
            lim_hit = (mode == 0) & (i >= limit)
            new_wait = new_wait | lim_hit
            mode = jnp.where(lim_hit, 3, mode)
            return (i, cache, scores_buf, score_sum, mode, tok, out_ids,
                    out_len, counts, triggered, resp_done, new_wait,
                    zh, zc, hist, hist_len, ema, passes, acc)

        def _gen_live(m):
            return jnp.any((m == 1) | (m == 2))

        if S > 1 and S_hi > S:
            tail_lo, tail_hi = spec_tail_for(S), spec_tail_for(S_hi)

            def spec_dispatch(st):
                # acceptance-adaptive width: EMA (state[16]) gates the
                # wide tail; both widths are compiled, outputs identical
                return jax.lax.cond(st[16] > _SPEC_EMA_HI,
                                    tail_hi, tail_lo, st)
        elif S > 1:
            spec_dispatch = spec_tail_for(S)

        def _gen_body(st):
            # some row prompts or decodes: mixed pass, or — once every
            # live row decodes — the speculative pure-decode tail
            return jax.lax.cond(
                jnp.any((st[4] == 0) | (st[4] == 1)),
                seq_pass, spec_dispatch, st)

        if S == 1 and k == 1:
            body = seq_pass
        elif k == 1:
            body = _gen_body
        elif S == 1:
            def body(state):
                return jax.lax.cond(_gen_live(state[4]),
                                    seq_pass, fused_score_pass, state)
        else:
            def body(state):
                return jax.lax.cond(_gen_live(state[4]),
                                    _gen_body, fused_score_pass, state)

        state = (start, cache, scores_buf, score_sum, mode0,
                 jnp.zeros((B,), jnp.int32),
                 jnp.zeros((B, N), jnp.int32), jnp.zeros((B,), jnp.int32),
                 counts, triggered0, jnp.zeros((B,), bool),
                 jnp.zeros((B,), bool), z_hist, z_cnt, hist0, hlen0,
                 (jnp.float32(0.0) if ema0 is None
                  else jnp.asarray(ema0, jnp.float32)),
                 jnp.int32(0), jnp.int32(0))
        (i, cache, scores_buf, score_sum, mode, tok, out_ids, out_len,
         counts, triggered, resp_done, _nw, z_hist, z_cnt,
         _hist, _hlen, ema, passes, acc) = jax.lax.while_loop(
            cond, body, state)
        last_tok = out_ids[jnp.arange(B), jnp.maximum(out_len - 1, 0)]
        # spec_info [3] f32: passes, committed tokens, acceptance EMA
        # (the EMA is serving state — the host wrapper threads it into
        # the next call so adaptation persists across response rounds)
        return (cache, scores_buf, i, score_sum, triggered, out_ids,
                out_len, counts, last_tok, z_hist, z_cnt,
                jnp.stack([passes.astype(jnp.float32),
                           acc.astype(jnp.float32), ema]))

    def serve_step(params, cache, ids, id_len, can_step, frames, start,
                   limit, score_sum, counts, prob_threshold,
                   sum_threshold, head_mask, gen_ids, gen_len,
                   ctx_ids, ctx_len, do_generate, z_thr, z_hist, z_cnt,
                   first_n, resume_at, spec_ema, retire_defer):
        """One serving-loop iteration as ONE program (the multi-stream
        QA hot path): fused [role-prefix + frame] step with its trigger
        rule evaluated on device, the batched trigger loop, and greedy
        generation for whatever triggered — so the host pays a single
        dispatch + fetch per iteration instead of three (the axon
        tunnel charges ~40 ms per sync; a real TPU host still saves
        the per-dispatch latency and the Python between them).

        ids/id_len: per-row role-transition prefixes (empty rows take a
        plain frame step). can_step: rows that consume a frame now.
        gen_ids/gen_len: the (shared) generation prompt, entering only
        when a row triggers. do_generate=False skips generation (the
        remove_assistant_turns path generates host-side so it can keep
        the pre-generation cache for rollback).

        Returns (cache, scores_buf [B,T,3], i, score_sum, triggered,
        out_ids, out_len, counts, last_tok, z_hist, z_cnt)."""
        B, T = frames.shape[:2]
        idx = jnp.clip(start, 0, T - 1)
        fe = frames[jnp.arange(B), idx]                  # [B, F, H]
        cache, s0 = append_text_frames(params, cache, ids, id_len, fe,
                                       active=can_step)
        s0 = s0.astype(jnp.float32)
        stream_end = s0[:, 0] * head_mask[0] + s0[:, 1] * head_mask[1]
        new_sum = score_sum + jnp.where(can_step, stream_end, 0.0)
        ok0 = can_step & (start >= resume_at)
        sum_hit = ok0 & (new_sum > sum_threshold)
        prob_hit = ok0 & (stream_end > prob_threshold)
        z_hist, z_cnt, z_hit = z_step(z_hist, z_cnt, stream_end,
                                      can_step, z_thr, first_n)
        z_hit = z_hit & ok0
        new_sum = jnp.where(sum_hit, 0.0, new_sum)
        fused_trig = sum_hit | prob_hit | z_hit
        i1 = start + can_step.astype(jnp.int32)
        scores_buf = jnp.where(
            can_step[:, None, None]
            & (jnp.arange(T)[None, :, None] == idx[:, None, None]),
            s0[:, None, :], jnp.zeros((B, T, 3), jnp.float32))

        # do_generate is STATIC (fixed per session): rollback sessions
        # pass False on every call, so compiling the decode machinery
        # into their hot program would be pure compile-time/HBM
        # waste — specialize it out instead of lax.cond-ing over it.
        if do_generate and serve_overlap:
            # overlapped scoring+generation: triggered rows decode
            # INLINE while the rest keep scoring (see _mixed_loop)
            return _mixed_loop(
                params, cache, frames, i1, limit, new_sum, fused_trig,
                scores_buf, prob_threshold, sum_threshold, head_mask,
                gen_ids, gen_len, counts, z_thr, z_hist, z_cnt, first_n,
                resume_at, ctx_ids, ctx_len, spec_ema, retire_defer)

        cache, scores_buf, i2, sum2, triggered, z_hist, z_cnt = \
            trigger_loop_impl(
                params, cache, frames, i1, limit, new_sum, fused_trig,
                scores_buf, prob_threshold, sum_threshold, head_mask,
                z_thr, z_hist, z_cnt, first_n, resume_at)
        N = max_new_tokens

        def gen_branch(op):
            c, cnt = op
            if spec_tokens > 1:
                return generate_spec(params, c, gen_ids, gen_len, cnt,
                                     active=triggered, ctx_ids=ctx_ids,
                                     ctx_len=ctx_len, ema0=spec_ema)
            return (*generate(params, c, gen_ids, gen_len, cnt,
                              active=triggered),
                    jnp.stack([jnp.float32(0), jnp.float32(0),
                               jnp.asarray(spec_ema, jnp.float32)]))

        def skip_branch(op):
            c, cnt = op
            # ema passes through untouched: a trigger-free iteration
            # must not reset the serving-level acceptance state
            return (c, jnp.zeros((B, N), jnp.int32),
                    jnp.zeros((B,), jnp.int32), cnt,
                    jnp.zeros((B,), jnp.int32),
                    jnp.stack([jnp.float32(0), jnp.float32(0),
                               jnp.asarray(spec_ema, jnp.float32)]))

        if do_generate:      # AHA_SERVE_OVERLAP=0: freeze-then-generate
            (cache, out_ids, out_len, counts2, last_tok,
             spec_info) = jax.lax.cond(
                jnp.any(triggered), gen_branch, skip_branch,
                (cache, counts))
        else:
            (cache, out_ids, out_len, counts2, last_tok,
             spec_info) = skip_branch((cache, counts))
        return (cache, scores_buf, i2, sum2, triggered,
                out_ids, out_len, counts2, last_tok, z_hist, z_cnt,
                spec_info)

    return SimpleNamespace(mixed_loop=_mixed_loop, serve_step=serve_step)

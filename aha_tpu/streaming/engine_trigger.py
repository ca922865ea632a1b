"""On-device trigger loops (split out of engine.py in round 5): score
frames until a stopping rule fires, solo and batched, per-frame and fused.
`make_trigger(core, cfg, policy, lora, lora_scale, fused_frames)` returns
the loop functions the engine jits; trace-time constants are captured
exactly as the former `StreamEngine._build` closures did.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from aha_tpu.models import qwen2
from aha_tpu.ops import spec_decode
from aha_tpu.streaming.engine_core import _scores_from_hidden


def make_trigger(core, cfg, policy, lora, lora_scale: float,
                 fused_frames: int) -> SimpleNamespace:
    append_frames = core.append_frames
    z_step = core.z_step
    _fused_frames_pass = core.fused_frames_pass

    def score_until_trigger(params, cache, frames, n_frames, score_sum,
                            prob_threshold, sum_threshold, head_mask,
                            resume_at):
        """Score up to n_frames frames (frames: [T, F, H], batch 1) with
        the trigger decision evaluated ON DEVICE each frame; stops at the
        first trigger. One dispatch instead of one per frame — the
        interactive loop runs at scan throughput between responses.

        Trigger semantics are the reference's exactly
        (test/inference.py:304-319): stream_end_score = sum of selected
        heads; fire if score > prob_threshold OR running sum >
        sum_threshold (sum resets to 0 on a sum-trigger). Thresholds are
        traced operands; pass +inf to disable one.

        Returns (cache, scores [T, 3], n_processed, new_score_sum,
        triggered).
        """
        T = frames.shape[0]
        scores_buf = jnp.zeros((T, 3), jnp.float32)

        def cond(state):
            i, _, _, _, triggered = state
            return (i < n_frames) & ~triggered

        def body(state):
            i, cache, scores_buf, score_sum, _ = state
            fe = jax.lax.dynamic_slice_in_dim(frames, i, 1, axis=0)  # [1,F,H]
            cache, s = append_frames(params, cache, fe)
            scores_buf = jax.lax.dynamic_update_slice_in_dim(
                scores_buf, s.astype(jnp.float32), i, axis=0)
            # stream_end_score over the configured heads (info, rel)
            stream_end = (s[0, 0] * head_mask[0] + s[0, 1] * head_mask[1])
            score_sum = score_sum + stream_end
            # response_min_interval_frames gate: suppressed frames fire
            # nothing and do NOT reset the running sum
            ok = i >= resume_at
            sum_hit = ok & (score_sum > sum_threshold)
            prob_hit = ok & (stream_end > prob_threshold)
            score_sum = jnp.where(sum_hit, 0.0, score_sum)
            return (i + 1, cache, scores_buf, score_sum, sum_hit | prob_hit)

        state = (jnp.int32(0), cache, scores_buf, score_sum, jnp.bool_(False))
        i, cache, scores_buf, score_sum, triggered = jax.lax.while_loop(
            cond, body, state)
        return cache, scores_buf, i, score_sum, triggered

    def score_until_trigger_fused(params, cache, frames, n_frames,
                                  score_sum, prob_threshold,
                                  sum_threshold, head_mask, resume_at):
        """Fused variant of score_until_trigger: chunks of
        `fused_frames` frames share ONE weight stream via the read-only
        verify pass (append_frames_fused rationale), with acceptance =
        frames up to AND INCLUDING the first trigger. The verify pass
        never writes the cache, so committing only the pre-trigger
        prefix is exact — scores, cache, running sum and the trigger
        point all match the per-frame loop (tests/test_fused_scoring.py
        ::test_fused_trigger_loop_matches_sequential). Triggers exit
        the loop, so `i` stays k-aligned whenever the body runs and the
        dynamic_slice below never clamps (the public wrapper pads T to
        a multiple of k >= n_frames).

        frames: [T, F, H] (batch 1), T a multiple of fused_frames.
        """
        T, F, H = frames.shape
        k = fused_frames
        scores_buf = jnp.zeros((T, 3), jnp.float32)
        j = jnp.arange(k, dtype=jnp.int32)

        def cond(state):
            i, _, _, _, triggered = state
            return (i < n_frames) & ~triggered

        def body(state):
            i, cache, scores_buf, score_sum, _ = state
            fe = jax.lax.dynamic_slice_in_dim(frames, i, k, axis=0)
            n_valid = jnp.clip(n_frames - i, 0, k).astype(jnp.int32)
            plans = spec_decode.plan_compose(
                cache, policy, (n_valid * F)[None], k, step=F)
            hidden, infl_k, infl_v = qwen2.decode_chunk_spec(
                params["llm"], cfg.llm, policy, cache,
                fe.reshape(1, k * F, H), plans,
                lora=lora, lora_scale=lora_scale)
            s = _scores_from_hidden(params, cfg,
                                    hidden[:, F - 1::F])[0]     # [k, 3]
            s = s.astype(jnp.float32)
            valid = j < n_valid
            stream_end = jnp.where(
                valid, s[:, 0] * head_mask[0] + s[:, 1] * head_mask[1],
                0.0)
            run = score_sum + jnp.cumsum(stream_end)            # [k]
            # pre-trigger cumulative sums need no reset handling: any
            # earlier sum-trigger would have exited the loop already
            ok = ((i + j) >= resume_at) & valid
            sum_hit = ok & (run > sum_threshold)
            prob_hit = ok & (stream_end > prob_threshold)
            trig = sum_hit | prob_hit
            any_trig = jnp.any(trig)
            first = jnp.argmax(trig).astype(jnp.int32)
            A = jnp.where(any_trig, first + 1, n_valid)         # accepted
            new_sum = run[jnp.maximum(A - 1, 0)]
            new_sum = jnp.where(any_trig & sum_hit[first], 0.0, new_sum)
            cache = spec_decode.select_meta(cache, plans, A[None])
            cache = spec_decode.commit_slots(
                cache, plans, infl_k, infl_v, (A * F)[None], policy.junk)
            keep = (j < A)[:, None]
            scores_buf = jax.lax.dynamic_update_slice_in_dim(
                scores_buf, jnp.where(keep, s, 0.0), i, axis=0)
            return (i + A, cache, scores_buf, new_sum, any_trig)

        state = (jnp.int32(0), cache, scores_buf, score_sum,
                 jnp.bool_(False))
        i, cache, scores_buf, score_sum, triggered = jax.lax.while_loop(
            cond, body, state)
        return cache, scores_buf, i, score_sum, triggered

    def _trigger_loop(params, cache, frames, start, limit, score_sum,
                      triggered0, scores_buf, prob_threshold,
                      sum_threshold, head_mask, z_thr, z_hist, z_cnt,
                      first_n, resume_at):
        """Shared body of the batched trigger loop (see
        score_until_trigger_multi). triggered0 lets serve_step enter
        with rows already frozen by its fused first step."""
        B, T = frames.shape[:2]
        entry_active = (start < limit) & ~triggered0

        def row_active(i, triggered):
            return (i < limit) & ~triggered

        def cond(state):
            i, _, _, _, triggered, _, _ = state
            act = row_active(i, triggered)
            return jnp.any(act) & ~jnp.any(entry_active & ~act)

        def body(state):
            i, cache, scores_buf, score_sum, triggered, zh, zc = state
            act = row_active(i, triggered)
            idx = jnp.clip(i, 0, T - 1)
            fe = frames[jnp.arange(B), idx]              # [B, F, H]
            cache, s = append_frames(params, cache, fe, act)
            s = s.astype(jnp.float32)
            scores_buf = jnp.where(
                act[:, None, None]
                & (jnp.arange(T)[None, :, None] == idx[:, None, None]),
                s[:, None, :], scores_buf)
            stream_end = s[:, 0] * head_mask[0] + s[:, 1] * head_mask[1]
            new_sum = score_sum + jnp.where(act, stream_end, 0.0)
            ok = act & (i >= resume_at)
            sum_hit = ok & (new_sum > sum_threshold)
            prob_hit = ok & (stream_end > prob_threshold)
            zh, zc, z_hit = z_step(zh, zc, stream_end, act, z_thr,
                                   first_n)
            z_hit = z_hit & ok
            new_sum = jnp.where(sum_hit, 0.0, new_sum)
            return (i + act.astype(jnp.int32), cache, scores_buf,
                    new_sum, triggered | sum_hit | prob_hit | z_hit,
                    zh, zc)

        state = (start, cache, scores_buf, score_sum, triggered0,
                 z_hist, z_cnt)
        (i, cache, scores_buf, score_sum, triggered, z_hist,
         z_cnt) = jax.lax.while_loop(cond, body, state)
        return cache, scores_buf, i, score_sum, triggered, z_hist, z_cnt

    def _trigger_loop_fused(params, cache, frames, start, limit,
                            score_sum, triggered0, scores_buf,
                            prob_threshold, sum_threshold, head_mask,
                            z_thr, z_hist, z_cnt, first_n, resume_at):
        """_trigger_loop at `fused_frames` frames per weight stream
        (_fused_frames_pass). Per-row traces, cache contents, sums and
        z-state are identical to the sequential loop; the only
        observable difference is SCHEDULING — within the pass that
        contains the first event, event-free rows complete their whole
        k-frame chunk instead of stopping in lockstep, so they may
        return up to k-1 frames further along. Rows are independent
        sessions bounded by their own `limit` (the host's query
        boundary), so those frames are exactly the ones the next
        invocation would have scored against the same cache state."""
        B, T = frames.shape[:2]
        k = fused_frames
        bidx = jnp.arange(B)
        j = jnp.arange(k, dtype=jnp.int32)
        entry_active = (start < limit) & ~triggered0

        def row_active(i, triggered):
            return (i < limit) & ~triggered

        def cond(state):
            i, _, _, _, triggered, _, _ = state
            act = row_active(i, triggered)
            return jnp.any(act) & ~jnp.any(entry_active & ~act)

        def body(state):
            i, cache, scores_buf, score_sum, triggered, zh, zc = state
            act = row_active(i, triggered)
            cache, s, A, fire, score_sum, zh, zc = _fused_frames_pass(
                params, cache, frames, i, act, limit, score_sum,
                prob_threshold, sum_threshold, head_mask, z_thr, zh, zc,
                first_n, resume_at)
            keep = j[None, :] < A[:, None]
            pos = i[:, None] + j[None, :]
            scores_buf = scores_buf.at[
                bidx[:, None], jnp.where(keep, pos, T)].set(
                s, mode="drop")
            return (i + A, cache, scores_buf, score_sum,
                    triggered | fire, zh, zc)

        state = (start, cache, scores_buf, score_sum, triggered0,
                 z_hist, z_cnt)
        (i, cache, scores_buf, score_sum, triggered, z_hist,
         z_cnt) = jax.lax.while_loop(cond, body, state)
        return cache, scores_buf, i, score_sum, triggered, z_hist, z_cnt

    trigger_loop_impl = (_trigger_loop_fused if fused_frames > 1
                         else _trigger_loop)

    def score_until_trigger_multi(params, cache, frames, start, limit,
                                  score_sum, prob_threshold, sum_threshold,
                                  head_mask, z_thr, z_hist, z_cnt,
                                  first_n, resume_at):
        """Batched per-row trigger loop (the multi-stream serving path;
        ref workload: test/inference.py:857-908 one-process-per-stream).
        frames: [B, T, F, H]; start/limit: [B] — each row scores frames
        start_b..limit_b-1 against ITS OWN trigger rule and freezes as
        soon as it fires (other rows keep going; frozen rows append
        zero valid tokens, so their cache state is untouched — exactly
        a paused independent session).

        The loop returns to the host as soon as the ACTIVE SET SHRINKS
        (any row triggers or reaches its limit), not when the whole
        batch drains: every stop needs host action anyway (generate for
        a trigger, refill/retire for a limit), and returning early
        keeps continuous-batching slots busy instead of idling frozen
        rows behind the batch's longest stream.

        Returns (cache, scores [B, T, 3], i [B] next index, score_sum
        [B], triggered [B]).
        """
        B, T = frames.shape[:2]
        scores_buf = jnp.zeros((B, T, 3), jnp.float32)
        return trigger_loop_impl(
            params, cache, frames, start, limit, score_sum,
            jnp.zeros((B,), bool), scores_buf,
            prob_threshold, sum_threshold, head_mask,
            z_thr, z_hist, z_cnt, first_n, resume_at)

    return SimpleNamespace(
        score_until_trigger=score_until_trigger,
        score_until_trigger_fused=score_until_trigger_fused,
        score_until_trigger_multi=score_until_trigger_multi,
        trigger_loop=_trigger_loop,
        trigger_loop_fused=_trigger_loop_fused,
        trigger_loop_impl=trigger_loop_impl,
    )

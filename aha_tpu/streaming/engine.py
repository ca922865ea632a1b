"""StreamEngine: the jitted compute primitives behind streaming inference.

TPU-first redesign of the reference's per-frame torch loop
(`/root/reference/test/inference.py:196-281` + `fast_greedy_generate` at
`/root/reference/models/modeling_live.py:64-90`). The reference runs one
eager forward per frame with a dynamically growing cache and syncs three
floats to the host per frame; here every hot path is a jitted function over
the static ring-buffer cache:

  * ``append_ids``     — feed a padded chunk of token ids through the decoder,
  * ``append_frames``  — feed one frame's visual tokens, returning the three
                         per-frame scores (still on device),
  * ``score_stream``   — ``lax.scan`` over T frames with zero host syncs
                         (the no-generation benchmark fast path),
  * ``generate``       — greedy decode as ``lax.while_loop`` with repetition
                         penalty and a static [max_new_tokens] output buffer,
  * ``encode_frames``  — batched vision tower + projector (pre-encoding).

Token-id chunks are padded to a small set of bucket lengths so each bucket
compiles once. Scores/ids only cross to the host when the session decides.
"""

from __future__ import annotations

import functools
from bisect import bisect_left

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.config import AhaConfig
from aha_tpu.models import aha, qwen2
from aha_tpu.ops import attention, spec_decode
from aha_tpu.ops.kv_cache import (CachePolicy, KVCache, init_cache,
                                  reset_cache, reset_cache_rows)


ID_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def z_step_host(zh: np.ndarray, zc: np.ndarray, b: int, score,
                z_thr, first_n) -> bool:
    """Numpy mirror of the traced ``z_step`` for host-checked fused steps
    (the multi-stream instrumented branch, the solo chunked loop's prefix
    frames): push ``score`` into row ``b``'s window IN PLACE and return
    whether the z rule fires. Same arithmetic as the device rule — f32
    window, mean/var over the last min(count, L) entries, 1e-6 std floor,
    fire once max(first_n, 2) frames have been pushed and the window
    holds >= 2. The push happens unconditionally (z_thr=inf only disables
    firing, never the window update); callers AND the result with their
    own eligibility gate."""
    se32 = np.float32(score)
    zh[b, :-1] = zh[b, 1:]
    zh[b, -1] = se32
    zc[b] += 1
    L = zh.shape[1]
    n = min(int(zc[b]), L)
    w = zh[b, L - n:]
    nf = np.float32(max(n, 1))
    mean = np.float32(w.sum(dtype=np.float32) / nf)
    var = np.float32(((w - mean) ** 2).sum(dtype=np.float32) / nf)
    z = (se32 - mean) / max(np.float32(np.sqrt(var)), np.float32(1e-6))
    return (int(zc[b]) >= max(int(first_n), 2) and n >= 2
            and float(z) > float(z_thr))


def _bucket(n: int, buckets=ID_BUCKETS) -> int:
    i = bisect_left(buckets, n)
    if i == len(buckets):
        raise ValueError(f"id chunk of {n} tokens exceeds the largest bucket {buckets[-1]}")
    return buckets[i]


def _last_valid(x: jnp.ndarray, valid_len: jnp.ndarray) -> jnp.ndarray:
    """x: [B, S, ...] -> [B, ...] at index valid_len-1 per row."""
    B = x.shape[0]
    idx = jnp.maximum(valid_len - 1, 0)
    return x[jnp.arange(B), idx]


def _scores_from_hidden(params, cfg: AhaConfig, hidden_last: jnp.ndarray) -> jnp.ndarray:
    """hidden_last: [..., H] -> [..., 3] (informative, relevance, uncertainty).

    informative = softmax(info_logits)[..., 1]; relevance = sigmoid(rel);
    uncertainty = exp(log_variance)  (ref: test/inference.py:222-227).
    """
    hf = hidden_last.astype(jnp.float32)
    heads = params["heads"]
    info = jnp.einsum("...h,ho->...o", hf, heads["informative"]["kernel"].astype(jnp.float32))
    rel = jnp.einsum("...h,ho->...o", hf, heads["relevance"]["kernel"].astype(jnp.float32))
    unc = jnp.einsum("...h,ho->...o", hf, heads["uncertainty"]["kernel"].astype(jnp.float32))
    informative = jax.nn.softmax(info, axis=-1)[..., 1]
    relevance = jax.nn.sigmoid(rel[..., 0])
    uncertainty = jnp.exp(unc[..., 0])
    return jnp.stack([informative, relevance, uncertainty], axis=-1)


def _serve_overlap() -> bool:
    """AHA_SERVE_OVERLAP (default on): serve_step generates inline in the
    mixed while_loop so non-triggered rows keep scoring through a decode
    (engine._mixed_loop). 0 falls back to freeze-then-generate — kept for
    on-chip A/B and as an escape hatch.

    Read ONCE per StreamEngine at construction (the value picks which
    program serve_step traces, and jit caches per engine): toggling the
    env var after an engine exists has no effect on it — build a new
    session/engine per arm when A/Bing (scripts/perf/ab_serve_overlap.py
    does)."""
    import os

    return os.environ.get("AHA_SERVE_OVERLAP", "1") not in ("0", "false")


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
import os as _os_mod

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


class StreamEngine:
    """Holds params + compiled primitives for one (config, policy) pair."""

    def __init__(
        self,
        params: dict,
        cfg: AhaConfig,
        policy: CachePolicy,
        *,
        batch: int = 1,
        max_new_tokens: int = 200,
        repetition_penalty: float | None = None,
        vision_batch: int = 32,
        lora: dict | None = None,
        lora_scale: float = 0.0,
        mesh=None,
        kv_dtype=None,
        spec_tokens: int | None = None,
        spec_tokens_max: int | None = None,
        fused_score_frames: int | None = None,
    ):
        """mesh: optional jax.sharding.Mesh('data','model') — mesh-sharded
        (TP/DP) inference. Params and cache get NamedShardings from
        parallel/mesh.py rules (kv heads over `model`, batch over `data`)
        and XLA's GSPMD inserts the collectives; this is how the bf16 7B
        (15.8 GB weights) serves on a v5e-4 where one 16 GB chip cannot
        hold it (SURVEY §7 "7B weights + cache on small-HBM chips")."""
        self.cfg = cfg
        if attention._decode_attn_backend() == "pallas":
            # the fused decode-attention kernel needs tileable cache shapes;
            # without this the opt-in env var silently fell back to jnp
            # (the default 2049-slot cache fails _pallas_decode_ok)
            policy = policy.with_aligned_slots(128)
        self.policy = policy
        self.batch = batch
        self.max_new_tokens = max_new_tokens
        self.repetition_penalty = repetition_penalty
        self.vision_batch = vision_batch
        self.lora = lora
        self.lora_scale = lora_scale
        self.kv_dtype = kv_dtype
        # speculative decoding chunk size (carried token + S-1 n-gram
        # drafts per weight stream); 1 = off. Exact greedy parity with the
        # sequential loop either way (generate_spec docstring). The raw
        # engine default is off (tests construct engines directly and CPU
        # verify passes are compute-priced, not DMA-free); the product
        # surface defaults to InferConfig.spec_decode_tokens=4 — measured
        # free-when-rejected on the chip (ab_spec_decode.py). A set
        # AHA_SPEC_DECODE always wins (global kill switch / sweep knob,
        # even over an explicit config value).
        import os as _os

        env_s = _os.environ.get("AHA_SPEC_DECODE")
        if env_s:
            spec_tokens = int(env_s)
        elif spec_tokens is None:
            spec_tokens = 1
        self.spec_tokens = max(int(spec_tokens), 1)
        # acceptance-adaptive ceiling: spec passes widen to spec_max while
        # the on-device acceptance EMA stays above _SPEC_EMA_HI (both
        # widths compile into the program behind a lax.cond; outputs are
        # byte-identical at any width — only speed changes). Raw-engine
        # default: fixed width (tests build engines directly; compiling a
        # second tail everywhere is pure CPU-test cost). The product
        # surface sets InferConfig.spec_decode_tokens_max=8. A set
        # AHA_SPEC_MAX always wins.
        env_m = _os.environ.get("AHA_SPEC_MAX")
        if env_m:
            spec_tokens_max = int(env_m)
        elif spec_tokens_max is None:
            spec_tokens_max = self.spec_tokens
        self.spec_max = max(int(spec_tokens_max), self.spec_tokens)
        if self.spec_tokens <= 1:
            self.spec_max = self.spec_tokens   # speculation off: no widening
        # acceptance counters from the last speculative generate/serve call
        # ([passes, committed_tokens, ema] f32, device array; fetch lazily)
        self.last_spec_info = None
        # serving-level acceptance EMA, threaded into every speculative
        # call (python float until the first call, then a device scalar)
        self._spec_ema = 0.0
        # run-level [passes, committed] accumulator (device, lazy-fetched
        # by A/Bs and bench via spec_acceptance())
        self.spec_totals = None
        # fused frame scoring: score_stream verifies this many frames per
        # weight stream (one read-only spec pass + commit, bit-equal to the
        # per-frame scan — append_frames_fused docstring); 1 = the plain
        # per-frame lax.scan. Like spec_tokens: raw-engine default off,
        # the product surface sets InferConfig.fused_score_frames, and a
        # set AHA_FUSED_SCORE env always wins.
        env_f = _os.environ.get("AHA_FUSED_SCORE")
        if env_f:
            fused_score_frames = int(env_f)
        elif fused_score_frames is None:
            fused_score_frames = 1
        self.fused_frames = max(int(fused_score_frames), 1)
        self.serve_overlap = _serve_overlap()
        self.mesh = mesh
        if mesh is not None:
            from aha_tpu.parallel.mesh import apply_named_sharding

            params = apply_named_sharding(params, mesh)
            if lora is not None:
                self.lora = apply_named_sharding(lora, mesh)
        else:
            from aha_tpu.ops import quant

            lyr = params.get("llm", {}).get("layers", {})
            backend = quant.matmul_backend()
            kern = lyr.get("q_proj", {}).get("kernel")
            fused_used = quant.is_quantized(kern) and (
                ("q4value" in kern and backend in ("auto", "fused", "fused_a8"))
                or backend in ("fused", "fused_a8"))
            import os as _os

            del fused_used  # merge now covers every quantized backend
            merge_env = _os.environ.get("AHA_MERGE_PROJ")  # "1"/"0" override
            merge = (quant.is_quantized(kern)
                     and jax.default_backend() in ("tpu", "axon")
                     ) if merge_env is None else merge_env == "1"
            if merge and "qkv_proj" not in lyr and quant.is_quantized(kern):
                # quantized serving: merge q/k/v and gate/up so each layer
                # runs 4 matmul calls instead of 7. Originally justified for
                # the fused Pallas kernels (~10 us dispatch+glue per
                # pallas_call); measured on-chip for the int8 einsum decode
                # path too: B=8x64-token batched decode 422.0 tok/s merged
                # vs 405.3 split (+4%, fewer/larger weight streams per
                # pass) — so it is now the default for every quantized
                # backend. AHA_MERGE_PROJ=0 restores split projections.
                params = {**params,
                          "llm": quant.merge_decoder_projections(params["llm"])}
        self.params = params
        self._build()

    # -- construction -----------------------------------------------------

    def new_cache(self, dtype=None) -> KVCache:
        llm = self.cfg.llm
        cache = init_cache(
            self.policy,
            num_layers=llm.num_layers,
            batch=self.batch,
            num_kv_heads=llm.num_kv_heads,
            head_dim=llm.head_dim,
            dtype=dtype or self.kv_dtype or jnp.dtype(self.cfg.dtype),
        )
        if self.mesh is not None:
            from aha_tpu.parallel.mesh import shard_cache

            cache = shard_cache(cache, self.mesh)
        return cache

    def reset_cache(self, cache: KVCache) -> KVCache:
        return self._reset_cache(cache)

    def reset_cache_rows(self, cache: KVCache, rows) -> KVCache:
        """Recycle finished slots (continuous batching): reset only the rows
        where `rows` ([B] bool) is True, in place (donated)."""
        return self._reset_cache_rows(cache, jnp.asarray(rows, bool))

    def new_rep_counts(self) -> jnp.ndarray:
        return jnp.zeros((self.batch, self.cfg.llm.vocab_size), jnp.int32)

    def _build(self):
        cfg, policy = self.cfg, self.policy
        lora, lora_scale = self.lora, self.lora_scale

        def append_ids(params, cache, ids, valid_len):
            embeds = qwen2.embed_tokens(params["llm"], ids, dtype=jnp.dtype(cfg.dtype))
            hidden, cache = qwen2.decode_chunk(
                params["llm"], cfg.llm, policy, cache, embeds, valid_len,
                lora=lora, lora_scale=lora_scale,
            )
            last_h = _last_valid(hidden, valid_len)
            logits = qwen2.lm_logits(params["llm"], cfg.llm, last_h).astype(jnp.float32)
            return cache, logits

        def append_frames(params, cache, frame_embeds, active=None):
            # frame_embeds: [B, F, H]; active: [B] bool (finished rows write
            # zero valid tokens — the junk slot absorbs them)
            B, F = frame_embeds.shape[:2]
            valid_len = jnp.full((B,), F, jnp.int32)
            if active is not None:
                valid_len = jnp.where(active, valid_len, 0)
            hidden, cache = qwen2.decode_chunk(
                params["llm"], cfg.llm, policy, cache, frame_embeds, valid_len,
                lora=lora, lora_scale=lora_scale,
            )
            scores = _scores_from_hidden(params, cfg, hidden[:, -1])
            return cache, scores

        def append_text_frames(params, cache, ids, id_len, frame_embeds,
                               active=None):
            """One fused chunk: per-row text prefix immediately followed by
            one frame — the reference's _encode_frame forward granularity
            (`cat(embed(last_ids), frame_embeds)` in ONE model call,
            test/inference.py:211-217). Chunk boundaries are SEMANTIC under
            mask_mode='hf' (post-fill chunks attend non-causally within the
            chunk), so the role-transition prefix must share the frame's
            chunk for exact parity; a separate prefix append would give the
            prefix tokens different hidden states (and cached K/V) once the
            window is full.

            ids: [B, P] right-padded; id_len: [B]; frame_embeds: [B, F, H].
            Returns (cache, scores [B, 3]) — scores at the last frame token.
            """
            B, P = ids.shape
            F = frame_embeds.shape[1]
            S = P + F
            text_emb = qwen2.embed_tokens(params["llm"], ids,
                                          dtype=jnp.dtype(cfg.dtype))
            j = jnp.arange(S, dtype=jnp.int32)[None, :]       # [1, S]
            n = id_len[:, None].astype(jnp.int32)             # [B, 1]
            bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
            tx_idx = jnp.clip(j, 0, P - 1)
            fr_idx = jnp.clip(j - n, 0, F - 1)
            emb = jnp.where((j < n)[..., None],
                            text_emb[bidx, tx_idx],
                            frame_embeds[bidx, fr_idx])       # [B, S, H]
            valid_len = id_len.astype(jnp.int32) + F
            if active is not None:
                valid_len = jnp.where(active, valid_len, 0)
            hidden, cache = qwen2.decode_chunk(
                params["llm"], cfg.llm, policy, cache, emb, valid_len,
                lora=lora, lora_scale=lora_scale,
            )
            scores = _scores_from_hidden(params, cfg,
                                         _last_valid(hidden, valid_len))
            return cache, scores

        def z_step(z_hist, z_cnt, score, active, z_thr, first_n):
            """Push `score` into the per-row running window for active rows
            and evaluate the z-score stopping rule (session._z_trigger
            semantics, exactly): fire when the current score is more than
            z_thr standard deviations above the window mean, once
            max(first_n, 2) frames have been scored and the window holds
            >= 2 entries. z_thr=inf disables the rule for a row; the
            window (z_hist [B, L]) holds the LAST min(z_cnt, L) scores,
            newest in the final column."""
            L = z_hist.shape[1]
            pushed = jnp.concatenate([z_hist[:, 1:], score[:, None]], axis=1)
            z_hist = jnp.where(active[:, None], pushed, z_hist)
            z_cnt = z_cnt + active.astype(jnp.int32)
            n = jnp.minimum(z_cnt, L)
            m = jnp.arange(L)[None, :] >= (L - n[:, None])
            nf = jnp.maximum(n, 1).astype(jnp.float32)
            mean = jnp.sum(jnp.where(m, z_hist, 0.0), axis=1) / nf
            var = jnp.sum(jnp.where(m, (z_hist - mean[:, None]) ** 2, 0.0),
                          axis=1) / nf
            z = (score - mean) / jnp.maximum(jnp.sqrt(var), 1e-6)
            fire = (active & (z_cnt >= jnp.maximum(first_n, 2)) & (n >= 2)
                    & (z > z_thr))
            return z_hist, z_cnt, fire

        def score_stream(params, cache, frames, active=None):
            # frames: [B, T, F, H] -> scores [B, T, 3]; no host syncs.
            # active: [B, T] bool for ragged multi-stream batches.
            def step(c, xs):
                fe, act = xs
                c, s = append_frames(params, c, fe, act)
                return c, s

            act = (active.swapaxes(0, 1) if active is not None
                   else jnp.ones(frames.shape[:2], bool).swapaxes(0, 1))
            cache, scores = jax.lax.scan(step, cache, (frames.swapaxes(0, 1), act))
            return cache, scores.swapaxes(0, 1)

        def append_frames_fused(params, cache, frame_embeds, active=None):
            """k production F-token frame appends verified in ONE weight
            stream: frame_embeds [B, k, F, H] -> (cache, scores [B, k, 3]).

            Scoring a frame costs one full pass of the (weight-DMA-bound)
            decoder per `append_frames` call; the speculative machinery
            already proves extra query rows ride such a pass for free
            (BASELINE.md round 3: an S=4 verify pass costs the same as a
            1-token pass). Here the same read-only verify pass + composed
            F-token plans (`spec_decode.plan_compose(step=F)`) reproduce k
            sequential `decode_chunk(F)` steps exactly — per-frame scores
            and the committed cache match the per-frame scan for every
            policy and fill state (tests/test_fused_scoring.py) — while
            streaming the weights ONCE for k frames. Unlike speculative
            decode there is nothing to reject: frame inputs are known in
            advance, so the 'drafts' are always right and the commit is
            the full valid prefix.

            active: [B, k] bool, a per-row PREFIX (ragged stream tails).
            """
            B, k, F, H = frame_embeds.shape
            if active is None:
                n_act = jnp.full((B,), k, jnp.int32)
            else:
                n_act = jnp.sum(active.astype(jnp.int32), axis=1)
            valid_len = n_act * F
            plans = spec_decode.plan_compose(cache, policy, valid_len, k,
                                             step=F)
            hidden, infl_k, infl_v = qwen2.decode_chunk_spec(
                params["llm"], cfg.llm, policy, cache,
                frame_embeds.reshape(B, k * F, H), plans,
                lora=lora, lora_scale=lora_scale)
            cache = spec_decode.select_meta(cache, plans, n_act)
            cache = spec_decode.commit_slots(cache, plans, infl_k, infl_v,
                                             valid_len, policy.junk)
            scores = _scores_from_hidden(params, cfg, hidden[:, F - 1::F])
            return cache, scores

        def score_stream_fused(params, cache, frames, active=None):
            # frames: [B, T, F, H] -> scores [B, T, 3]; groups of
            # `fused_frames` frames share one weight stream (scan over
            # ceil(T/k) fused chunks; tail padded with inactive frames).
            # active: [B, T] bool, per-row PREFIX for ragged batches.
            B, T, F, H = frames.shape
            k = self.fused_frames
            n = -(-T // k)
            pad = n * k - T
            act = active if active is not None else jnp.ones((B, T), bool)
            if pad:
                frames = jnp.pad(frames, ((0, 0), (0, pad), (0, 0), (0, 0)))
                act = jnp.pad(act, ((0, 0), (0, pad)))
            fr = frames.reshape(B, n, k, F, H).swapaxes(0, 1)
            ac = act.reshape(B, n, k).swapaxes(0, 1)

            def step(c, xs):
                fe, a = xs
                c, s = append_frames_fused(params, c, fe, a)
                return c, s

            cache, scores = jax.lax.scan(step, cache, (fr, ac))
            scores = scores.swapaxes(0, 1).reshape(B, n * k, 3)[:, :T]
            return cache, scores

        def encode_frames(params, frames):
            return aha.visual_embed(params, cfg, frames)

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
            k = self.fused_frames
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

        def _fused_frames_pass(params, cache, frames, i, act, limit,
                               score_sum, prob_threshold, sum_threshold,
                               head_mask, z_thr, zh, zc, first_n, resume_at):
            """ONE fused k-frame scoring pass over the batch with per-row
            trigger acceptance — `score_until_trigger_fused`'s read-only
            verify + acceptance-gated commit generalized to B rows (each
            against ITS OWN thresholds/limit). The verify pass never writes
            the cache, so committing only each row's pre-trigger prefix
            (up to and including the triggering frame) is exact: scores,
            cache, running sums and z-state match the per-frame loop
            frame-for-frame (tests/test_fused_scoring.py).

            frames: [B, T, F, H]; i/act/limit: [B] row cursor / scoring
            rows / per-row frame limit (never exceeded: rows plan
            min(k, limit-i) frames). Returns (cache, s [B, k, 3],
            A [B] frames accepted, fire [B], new_sum [B], zh, zc).
            """
            B, T, F, H = frames.shape
            k = self.fused_frames
            bidx = jnp.arange(B)
            j = jnp.arange(k, dtype=jnp.int32)
            idx = jnp.clip(i[:, None] + j[None, :], 0, T - 1)   # [B, k]
            fe = frames[bidx[:, None], idx]                     # [B, k, F, H]
            n_valid = jnp.where(
                act, jnp.clip(limit - i, 0, k), 0).astype(jnp.int32)
            plans = spec_decode.plan_compose(cache, policy, n_valid * F, k,
                                             step=F)
            hidden, infl_k, infl_v = qwen2.decode_chunk_spec(
                params["llm"], cfg.llm, policy, cache,
                fe.reshape(B, k * F, H), plans,
                lora=lora, lora_scale=lora_scale)
            s = _scores_from_hidden(
                params, cfg, hidden[:, F - 1::F]).astype(jnp.float32)
            stream_end = (s[..., 0] * head_mask[0]
                          + s[..., 1] * head_mask[1])           # [B, k]

            # per-offset trigger sweep — [B]-vector work only, the weight
            # stream above is paid ONCE for all k frames. Reproduces the
            # sequential loop's order exactly: sum accumulate -> sum/prob
            # hits -> z push + hit -> sum reset -> freeze the row.
            run_sum = score_sum
            fire = jnp.zeros((B,), bool)
            A = jnp.zeros((B,), jnp.int32)
            for p in range(k):
                alive = act & ~fire & (p < n_valid)
                se = stream_end[:, p]
                run_sum = run_sum + jnp.where(alive, se, 0.0)
                ok = alive & ((i + p) >= resume_at)
                sum_hit = ok & (run_sum > sum_threshold)
                prob_hit = ok & (se > prob_threshold)
                zh, zc, z_hit = z_step(zh, zc, se, alive, z_thr, first_n)
                z_hit = z_hit & ok
                run_sum = jnp.where(sum_hit, 0.0, run_sum)
                A = A + alive.astype(jnp.int32)
                fire = fire | sum_hit | prob_hit | z_hit

            cache = spec_decode.select_meta(cache, plans, A)
            cache = spec_decode.commit_slots(cache, plans, infl_k, infl_v,
                                             A * F, policy.junk)
            return cache, s, A, fire, run_sum, zh, zc

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
            k = self.fused_frames
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

        trigger_loop_impl = (_trigger_loop_fused if self.fused_frames > 1
                             else _trigger_loop)

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
            N = self.max_new_tokens
            B, T = frames.shape[:2]
            F = frames.shape[2]
            Pg = gen_ids.shape[1]
            W = max(F, Pg)
            S = self.spec_tokens
            S_hi = self.spec_max
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
                        logits, counts_, self.repetition_penalty),
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
                            logits[:, p], counts, self.repetition_penalty),
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

            k = self.fused_frames

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
            if do_generate and self.serve_overlap:
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
            N = self.max_new_tokens

            def gen_branch(op):
                c, cnt = op
                if self.spec_tokens > 1:
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

        def generate(params, cache, prompt_ids, valid_len, counts, active=None):
            """Greedy decode (ref fast_greedy_generate). Returns
            (cache, out_ids [B, N], out_len [B], counts). Rows with
            active=False are no-ops: their prompt is skipped (valid_len
            forced to 0 -> junk slot) and they never emit or penalize a
            token — the multi-stream path generates for the triggered
            subset of a batch this way."""
            eos = cfg.eos_token_id
            N = self.max_new_tokens
            B = prompt_ids.shape[0]
            if active is not None:
                valid_len = jnp.where(active, valid_len, 0)
            cache, logits = append_ids(params, cache, prompt_ids, valid_len)
            tok = jnp.argmax(
                _apply_repetition_penalty(logits, counts, self.repetition_penalty), axis=-1
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
                    _apply_repetition_penalty(logits, counts, self.repetition_penalty), axis=-1
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
            weight stream verifies S = self.spec_tokens candidate tokens —
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
            S_lo = self.spec_tokens
            S_hi = self.spec_max
            eos = cfg.eos_token_id
            N = self.max_new_tokens
            B = prompt_ids.shape[0]
            P = prompt_ids.shape[1]
            C = 0 if ctx_ids is None else ctx_ids.shape[1]
            M = C + P + N + 1
            if active is not None:
                valid_len = jnp.where(active, valid_len, 0)
            cache, logits = append_ids(params, cache, prompt_ids, valid_len)
            tok = jnp.argmax(
                _apply_repetition_penalty(logits, counts, self.repetition_penalty), axis=-1
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
                            logits[:, p], counts, self.repetition_penalty),
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

        # the cache argument is donated on the per-chunk hot paths: the ring
        # buffer updates in place instead of being copied every frame.
        # `generate` deliberately does NOT donate — the session keeps the
        # pre-generation cache for remove_assistant_turns rollback, and the
        # judge reuses its rubric prefix cache across evaluations.
        def _jit(fn, **kw):
            if self.mesh is None:
                return jax.jit(fn, **kw)
            # GSPMD cannot auto-partition pallas_call: force the jnp quant
            # paths while the sharded programs TRACE (lazily, at first call)
            import functools as _ft

            from aha_tpu.ops import quant as _quant

            jitted = jax.jit(fn, **kw)

            @_ft.wraps(fn)
            def wrapped(*a, **k):
                old = _quant._FORCE_BACKEND
                _quant._FORCE_BACKEND = "jnp"
                try:
                    return jitted(*a, **k)
                finally:
                    _quant._FORCE_BACKEND = old

            return wrapped

        self._append_ids = _jit(append_ids, donate_argnums=(1,))
        self._append_frames = _jit(append_frames, donate_argnums=(1,))
        self._append_text_frames = _jit(append_text_frames, donate_argnums=(1,))
        self._score_stream = _jit(score_stream, donate_argnums=(1,))
        self._score_stream_fused = (
            _jit(score_stream_fused, donate_argnums=(1,))
            if self.fused_frames > 1 else None)
        self._append_frames_fused = (
            _jit(append_frames_fused, donate_argnums=(1,))
            if self.fused_frames > 1 else None)
        self._score_until_trigger = _jit(
            score_until_trigger_fused if self.fused_frames > 1
            else score_until_trigger, donate_argnums=(1,))
        self._score_until_trigger_multi = _jit(
            score_until_trigger_multi, donate_argnums=(1,))
        # cache donated (ring buffer updates in place); generation inside is
        # gated by do_generate, so rollback callers pass False and generate
        # host-side on a non-donating path
        self._serve_step = _jit(serve_step, donate_argnums=(1,),
                                static_argnums=(17,))
        self._encode_frames = _jit(encode_frames)
        # AHA_DONATE_GEN=1: measured TIE on-chip (B=8x64-token batched
        # decode: 409.3 tok/s donated vs 405.3 non-donated, within noise)
        # — the while-loop carry is already in-place without donation, so
        # the default stays NON-donated (rollback callers keep the
        # pre-generation cache alive; see session._generate_response).
        # The knob stays for reproducibility of the A/B (BASELINE.md,
        # in-situ knockout section). Donating callers must device-copy
        # first if they need rollback.
        import os as _os

        if _os.environ.get("AHA_DONATE_GEN") == "1":
            self._generate = _jit(generate, donate_argnums=(1,))
        else:
            self._generate = _jit(generate)
        # speculative variant: same non-donation rationale as generate
        self._generate_spec = (_jit(generate_spec)
                               if self.spec_tokens > 1 else None)
        # donated: k/v pass through aliased, metadata buffers reset in place
        self._reset_cache = jax.jit(reset_cache, donate_argnums=(0,))
        self._reset_cache_rows = jax.jit(reset_cache_rows, donate_argnums=(0,))

    # -- host-facing wrappers ---------------------------------------------

    def pad_ids(self, ids_list: list[list[int]]) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Right-pad a batch of id lists to a shared bucket length."""
        max_len = max((len(x) for x in ids_list), default=1)
        P = _bucket(max(max_len, 1))
        arr = np.zeros((len(ids_list), P), np.int32)
        lens = np.zeros((len(ids_list),), np.int32)
        for i, x in enumerate(ids_list):
            arr[i, : len(x)] = x
            lens[i] = len(x)
        return jnp.asarray(arr), jnp.asarray(lens)

    def append_ids(self, cache: KVCache, ids_list: list[list[int]]):
        ids, lens = self.pad_ids(ids_list)
        return self._append_ids(self.params, cache, ids, lens)

    def append_frames(self, cache: KVCache, frame_embeds: jnp.ndarray, active=None):
        return self._append_frames(self.params, cache, frame_embeds, active)

    def append_text_frames(self, cache: KVCache, ids_list: list[list[int]],
                           frame_embeds: jnp.ndarray, active=None):
        """Fused per-row [text prefix + frame] chunk (see append_text_frames
        in _build). frame_embeds: [B, F, H]."""
        ids, lens = self.pad_ids(ids_list)
        return self._append_text_frames(self.params, cache, ids, lens,
                                        frame_embeds, active)

    def score_stream(self, cache: KVCache, frames: jnp.ndarray, active=None):
        if self.fused_frames > 1:
            return self._score_stream_fused(self.params, cache, frames, active)
        return self._score_stream(self.params, cache, frames, active)

    def score_until_trigger(self, cache: KVCache, frames: jnp.ndarray,
                            n_frames: int, score_sum: float,
                            prob_threshold: float | None,
                            sum_threshold: float | None,
                            score_heads: tuple[str, ...],
                            resume_at: int = 0):
        """frames: [T, F, H] (batch 1). Pads T to a frame bucket so chunks of
        different lengths share one compiled program. resume_at: first
        CHUNK-LOCAL frame index eligible to trigger
        (response_min_interval_frames; <=0 = no suppression)."""
        T = frames.shape[0]
        Tp = _bucket(max(T, 1), (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096))
        if self.fused_frames > 1 and Tp % self.fused_frames:
            # the fused loop slices k-frame chunks at k-aligned offsets;
            # T must be a multiple of k so the final slice never clamps
            Tp += self.fused_frames - Tp % self.fused_frames
        if Tp > T:
            pad = jnp.zeros((Tp - T, *frames.shape[1:]), frames.dtype)
            frames = jnp.concatenate([frames, pad], axis=0)
        head_mask = jnp.asarray([
            1.0 if "informative_score" in score_heads else 0.0,
            1.0 if "relevance_score" in score_heads else 0.0,
        ], jnp.float32)
        inf = jnp.float32(jnp.inf)
        return self._score_until_trigger(
            self.params, cache, frames, jnp.int32(n_frames),
            jnp.float32(score_sum),
            inf if prob_threshold is None else jnp.asarray(prob_threshold, jnp.float32),
            inf if sum_threshold is None else jnp.asarray(sum_threshold, jnp.float32),
            head_mask, jnp.int32(max(int(resume_at), 0)),
        )

    def generate(self, cache: KVCache, ids_list: list[list[int]], counts: jnp.ndarray,
                 active=None, ctx=None):
        """ctx: optional (ctx_ids [B, C] int32, ctx_len [B] int32) draft
        context for the speculative n-gram lookup (recent conversation
        text). Draft source only — ignored by the sequential path and
        unable to change any output byte on the speculative one."""
        ids, lens = self.pad_ids(ids_list)
        if self._generate_spec is not None:
            ctx_ids, ctx_len = ctx if ctx is not None else (None, None)
            out = self._generate_spec(self.params, cache, ids, lens, counts,
                                      active, ctx_ids, ctx_len,
                                      jnp.asarray(self._spec_ema, jnp.float32))
            *res, spec_info = out
            # [passes, committed, ema]: counters for A/Bs; the EMA threads
            # into the next call so width adaptation persists across
            # responses (device scalar — no host sync on the hot path)
            self._absorb_spec_info(spec_info)
            return tuple(res)
        return self._generate(self.params, cache, ids, lens, counts, active)

    def _absorb_spec_info(self, spec_info):
        self.last_spec_info = spec_info
        self._spec_ema = spec_info[2]
        self.spec_totals = (spec_info[:2] if self.spec_totals is None
                            else self.spec_totals + spec_info[:2])

    def spec_acceptance(self) -> dict:
        """Host-fetched run-level speculation counters: verify passes,
        committed tokens, tokens/pass, and the current acceptance EMA.
        Call at measurement boundaries only (forces a device sync)."""
        if self.spec_totals is None:
            return {"passes": 0, "committed": 0, "tokens_per_pass": 0.0,
                    "ema": 0.0}
        passes, committed = (float(x) for x in np.asarray(
            jax.device_get(self.spec_totals)))
        return {"passes": int(passes), "committed": int(committed),
                "tokens_per_pass": round(committed / max(passes, 1.0), 3),
                "ema": round(float(jax.device_get(
                    jnp.asarray(self._spec_ema, jnp.float32))), 4)}

    def reset_spec_totals(self):
        self.spec_totals = None

    def new_z_state(self, window: int = 20):
        """(z_hist [B, window], z_cnt [B]) for the z-score stopping rule —
        pass through score_until_trigger_multi / serve_step calls; rows
        reset on slot admission (multi.py)."""
        return (jnp.zeros((self.batch, window), jnp.float32),
                jnp.zeros((self.batch,), jnp.int32))

    def score_until_trigger_multi(self, cache: KVCache, frames: jnp.ndarray,
                                  start, limit, score_sum,
                                  prob_threshold: float | None,
                                  sum_threshold: float | None,
                                  score_heads: tuple[str, ...],
                                  z_threshold=None, z_state=None,
                                  first_n_frames: int = 0, resume_at=None):
        """frames: [B, T, F, H]; start/limit/score_sum: [B]-likes.
        Thresholds may be scalars or per-row [B] arrays (inf disables).
        Returns (..., z_hist, z_cnt) — thread z_state between calls when
        the z rule is in use."""
        head_mask = jnp.asarray([
            1.0 if "informative_score" in score_heads else 0.0,
            1.0 if "relevance_score" in score_heads else 0.0,
        ], jnp.float32)
        inf = jnp.float32(jnp.inf)
        z_hist, z_cnt = z_state if z_state is not None else self.new_z_state()
        return self._score_until_trigger_multi(
            self.params, cache, frames,
            jnp.asarray(start, jnp.int32), jnp.asarray(limit, jnp.int32),
            jnp.asarray(score_sum, jnp.float32),
            inf if prob_threshold is None else jnp.asarray(prob_threshold, jnp.float32),
            inf if sum_threshold is None else jnp.asarray(sum_threshold, jnp.float32),
            head_mask,
            inf if z_threshold is None else jnp.asarray(z_threshold, jnp.float32),
            jnp.asarray(z_hist, jnp.float32), jnp.asarray(z_cnt, jnp.int32),
            jnp.int32(first_n_frames),
            (jnp.zeros((self.batch,), jnp.int32) if resume_at is None
             else jnp.asarray(resume_at, jnp.int32)),
        )

    def serve_step(self, cache: KVCache, prefix_rows: list[list[int]],
                   can_step, frames: jnp.ndarray, start, limit, score_sum,
                   counts: jnp.ndarray, prob_threshold: float | None,
                   sum_threshold: float | None,
                   score_heads: tuple[str, ...],
                   gen_prompt: list[int], *, do_generate: bool = True,
                   z_threshold=None, z_state=None, first_n_frames: int = 0,
                   resume_at=None, ctx=None, retire_defer: int = 1):
        """One fused serving iteration (see serve_step in _build).
        prefix_rows: per-row role-transition prefix ids ([] = plain frame).
        frames: [B, T, F, H]. Thresholds may be scalars or per-row [B]
        arrays (inf disables a criterion for a row). ctx: optional
        (ctx_ids [B, C] int32, ctx_len [B]) draft context for the
        speculative n-gram lookup (recent conversation text; draft source
        only, cannot change output). Returns (cache,
        scores [B, T, 3], i, sum, triggered, out_ids, out_len, counts,
        last_tok, z_hist, z_cnt)."""
        B = frames.shape[0]
        ids, lens = self.pad_ids(prefix_rows)
        gen_ids, gen_len = self.pad_ids([list(gen_prompt)] * B)
        ctx_ids, ctx_len = ((None, None) if ctx is None
                            else (jnp.asarray(ctx[0], jnp.int32),
                                  jnp.asarray(ctx[1], jnp.int32)))
        head_mask = jnp.asarray([
            1.0 if "informative_score" in score_heads else 0.0,
            1.0 if "relevance_score" in score_heads else 0.0,
        ], jnp.float32)
        inf = jnp.float32(jnp.inf)
        z_hist, z_cnt = z_state if z_state is not None else self.new_z_state()
        out = self._serve_step(
            self.params, cache, ids, lens, jnp.asarray(can_step, bool),
            frames, jnp.asarray(start, jnp.int32),
            jnp.asarray(limit, jnp.int32),
            jnp.asarray(score_sum, jnp.float32), counts,
            inf if prob_threshold is None else jnp.asarray(prob_threshold, jnp.float32),
            inf if sum_threshold is None else jnp.asarray(sum_threshold, jnp.float32),
            head_mask, gen_ids, gen_len, ctx_ids, ctx_len,
            bool(do_generate),
            inf if z_threshold is None else jnp.asarray(z_threshold, jnp.float32),
            jnp.asarray(z_hist, jnp.float32), jnp.asarray(z_cnt, jnp.int32),
            jnp.int32(first_n_frames),
            (jnp.zeros((B,), jnp.int32) if resume_at is None
             else jnp.asarray(resume_at, jnp.int32)),
            jnp.asarray(self._spec_ema, jnp.float32),
            jnp.asarray(max(int(retire_defer), 1), jnp.int32),
        )
        *res, spec_info = out
        # [passes, committed, ema] from this iteration's generation; the
        # EMA is serving state and threads into the next call (device
        # scalar, no host sync) — callers keep the historical 11-tuple
        self._absorb_spec_info(spec_info)
        return tuple(res)

    def encode_frames(self, frames: np.ndarray | jnp.ndarray) -> jnp.ndarray:
        """Pre-encode [N, H, W, 3] pixel frames to [N, F, H_llm] in fixed-size
        batches (ref batch of 32, test/inference.py:181-185); the last batch
        is padded to keep one compiled shape."""
        N = frames.shape[0]
        vb = self.vision_batch
        outs = []
        for i in range(0, N, vb):
            chunk = frames[i : i + vb]
            pad = vb - chunk.shape[0]
            if pad:
                chunk = np.concatenate([np.asarray(chunk), np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
            out = self._encode_frames(self.params, jnp.asarray(chunk))
            outs.append(out[: vb - pad] if pad else out)
        if not outs:
            H = self.cfg.llm.hidden_size
            return jnp.zeros((0, self.cfg.frame_num_tokens, H), jnp.dtype(self.cfg.dtype))
        return jnp.concatenate(outs, axis=0)

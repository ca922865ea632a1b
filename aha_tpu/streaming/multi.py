"""Multi-stream batched scoring: N concurrent video streams on one chip.

The production-serving design point (BASELINE.md config #5: 8 concurrent
hour-long streams): the batch dimension runs over sessions, so one pass of
the weight stream from HBM scores a frame for every stream — aggregate
throughput scales nearly linearly in the batch until compute-bound. The
reference processes one stream per process/GPU; this is the TPU-native
replacement.

Three classes:

* :class:`MultiStreamScorer` — score-only lockstep batch (grounding /
  highlight workloads, no generation triggers).
* :class:`MultiStreamSession` — full streaming QA (ref workload:
  test/inference.py:857-908): per-row queries at their own times, per-row
  on-device trigger evaluation (`engine.score_until_trigger_multi` — a row
  freezes the moment ITS rule fires while the others keep scoring), and
  batched greedy generation with ragged completion
  (`engine.generate(active=...)`; non-triggered rows are exact no-ops).
  Every row reproduces an independent StreamSession's outputs: frozen /
  inactive rows append zero valid tokens, so their cache slice never
  diverges from a solo run.
* :class:`MultiStreamServer` — continuous batching over B slots: a fixed
  MultiStreamSession group runs in lockstep, so the whole batch idles
  until its longest stream finishes; the server instead admits the next
  waiting stream into a slot the moment it frees (per-row cache reset —
  `ops.kv_cache.reset_cache_rows`), keeping all B rows busy on ragged
  workloads. Per-stream outputs still equal independent sessions.

Ragged batches are padded and masked with per-row active flags (finished
rows write into the cache's junk slot, never polluting attention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.config import AhaConfig, InferConfig
from aha_tpu.ops.kv_cache import CachePolicy
from aha_tpu.streaming.engine import StreamEngine, z_step_host
from aha_tpu.tokenization import StreamTokenizer


class MultiStreamScorer:
    def __init__(
        self,
        params: dict,
        cfg: AhaConfig,
        tokenizer: StreamTokenizer,
        infer_cfg: InferConfig,
        *,
        batch: int,
        lora: dict | None = None,
        lora_scale: float = 0.0,
        mesh=None,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.args = infer_cfg
        self.batch = batch
        policy = CachePolicy(
            kind=infer_cfg.kv_cache_policy,
            window=infer_cfg.kv_window,
            num_sink=infer_cfg.num_sink_tokens,
            mask_mode=infer_cfg.kv_mask_mode,
        )
        self.engine = StreamEngine(
            params, cfg, policy, batch=batch,
            lora=lora, lora_scale=lora_scale, mesh=mesh,
            kv_dtype=jnp.int8 if infer_cfg.kv_cache_dtype == "int8" else None,
            fused_score_frames=infer_cfg.fused_score_frames)

    def score_videos(
        self,
        videos: list[np.ndarray],      # B arrays [T_i, S, S, 3]
        queries: list[str | None],
        *,
        fps: float,
        chunk_frames: int | None = None,
    ) -> list[list[dict]]:
        """Score B streams in lockstep; returns per-stream debug_data."""
        B = len(videos)
        assert B == self.batch, (B, self.batch)
        cache = self.engine.new_cache()

        # per-stream query chunk (ragged lengths handled by append_ids)
        id_rows = []
        for q in queries:
            row = []
            if q is not None:
                row += self.tokenizer.apply_chat_template(
                    [{"role": "user", "content": q}],
                    add_stream_query_prompt=False, add_stream_prompt=True,
                )
            id_rows.append(row)
        if any(id_rows):
            cache, _ = self.engine.append_ids(cache, id_rows)
        start_ids = self.tokenizer.apply_chat_template(
            [{"role": "system", "content": self.args.system_prompt}]
        )
        cache, _ = self.engine.append_ids(cache, [start_ids] * B)

        # vision encode all frames (flat), then pack ragged [B, T_max, F, H]
        lengths = [v.shape[0] for v in videos]
        T_max = max(lengths)
        flat = np.concatenate(videos, axis=0)
        embeds = self.engine.encode_frames(flat)       # [sum_T, F, H]
        F, H = embeds.shape[1], embeds.shape[2]
        packed = jnp.zeros((B, T_max, F, H), embeds.dtype)
        off = 0
        for i, n in enumerate(lengths):
            packed = packed.at[i, :n].set(embeds[off : off + n])
            off += n
        active = np.zeros((B, T_max), bool)
        for i, n in enumerate(lengths):
            active[i, :n] = True

        cache, scores = self.engine.score_stream(cache, packed, jnp.asarray(active))
        scores = np.asarray(jax.device_get(scores), np.float64)  # [B, T_max, 3]

        out = []
        for i, n in enumerate(lengths):
            rows = []
            for t in range(n):
                rows.append(dict(
                    time=t / fps,
                    informative_score=float(scores[i, t, 0]),
                    relevance_score=float(scores[i, t, 1]),
                    uncertainty_score=float(scores[i, t, 2]),
                ))
            out.append(rows)
        return out


@partial(jax.jit, donate_argnums=(0,))
def _admit_row(buf, row, b):
    """Write one stream's padded embed row into the serving frames buffer
    in place (donated) — a plain eager ``buf.at[b].set`` would copy the
    whole [B, max_frames, F, H] buffer on every admission."""
    return buf.at[b].set(row)


class MultiStreamSession:
    """B concurrent streaming-QA sessions in one batched engine.

    API: ``run(videos, conversations, fps)`` -> per-stream
    ``{"responses": [...], "debug_data": [...]}``, with the same trigger /
    template / rollback semantics as :class:`StreamSession.inference`.
    """

    def __init__(
        self,
        params: dict,
        cfg: AhaConfig,
        tokenizer: StreamTokenizer,
        infer_cfg: InferConfig,
        *,
        batch: int,
        engine: StreamEngine | None = None,
        lora: dict | None = None,
        lora_scale: float = 0.0,
        mesh=None,
    ):
        infer_cfg.validate()
        if infer_cfg.threshold_z is not None and not (
                isinstance(infer_cfg.running_list_length, int)
                and infer_cfg.running_list_length >= 2):
            raise ValueError(
                "batched threshold_z needs a bounded running_list_length "
                ">= 2 (the z window is fixed-size per-row device state); "
                f"got {infer_cfg.running_list_length!r}. Use independent "
                "StreamSessions for an unbounded running list.")
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.args = infer_cfg
        self.batch = batch
        policy = CachePolicy(
            kind=infer_cfg.kv_cache_policy,
            window=infer_cfg.kv_window,
            num_sink=infer_cfg.num_sink_tokens,
            mask_mode=infer_cfg.kv_mask_mode,
        )
        self.engine = engine or StreamEngine(
            params, cfg, policy, batch=batch,
            max_new_tokens=infer_cfg.max_new_tokens,
            repetition_penalty=infer_cfg.repetition_penalty,
            lora=lora, lora_scale=lora_scale, mesh=mesh,
            kv_dtype=jnp.int8 if infer_cfg.kv_cache_dtype == "int8" else None,
            spec_tokens=infer_cfg.spec_decode_tokens,
            spec_tokens_max=infer_cfg.spec_decode_tokens_max,
            fused_score_frames=infer_cfg.fused_score_frames,
        )
        # per-row trigger thresholds (the reference runs one process per
        # stream, each with its own sensitivity; the batched server keeps
        # that capability — `aha serve` requests may override per stream).
        # inf disables a criterion for that row.
        self._default_prob = (np.inf if infer_cfg.stream_end_prob_threshold
                              is None else
                              float(infer_cfg.stream_end_prob_threshold))
        self._default_sum = (np.inf if infer_cfg.stream_end_score_sum_threshold
                             is None else
                             float(infer_cfg.stream_end_score_sum_threshold))
        self._default_z = (np.inf if infer_cfg.threshold_z is None
                           else float(infer_cfg.threshold_z))
        # batched retirement: exit the device loop to the host only once
        # this many rows wait (InferConfig.retire_defer; clamped to batch)
        self.retire_defer = min(max(int(getattr(infer_cfg, "retire_defer", 1)
                                        or 1), 1), batch)
        tok = tokenizer
        self._start_ids = tok.apply_chat_template(
            [{"role": "system", "content": infer_cfg.system_prompt}])
        self._stream_prompt_ids = tok.apply_chat_template([{}], add_stream_prompt=True)
        self._gen_prompt_ids = tok.apply_chat_template(
            [{}], add_stream_generation_prompt=True)

    def run(
        self,
        videos: list[np.ndarray],          # B arrays [T_i, S, S, 3]
        conversations: list[list[dict]],   # B lists of {"role","content","time"}
        *,
        fps: float,
    ) -> list[dict]:
        """Lockstep serving of exactly `batch` streams — a fixed-group
        special case of :meth:`run_items` (all slots admitted up front, no
        refill). Kept as the API the bench and the lockstep A/B drive."""
        B = self.batch
        assert len(videos) == B and len(conversations) == B
        T_max = max((int(v.shape[0]) for v in videos), default=1)
        res = self.run_items(
            list(zip(range(B), videos, conversations)),
            fps=fps, max_frames=max(T_max, 1),
        )
        return [res[b] for b in range(B)]

    def run_items(self, items, *, fps: float, on_result=None,
                  max_frames: int | None = None, stats: dict | None = None) -> dict:
        """The serving loop: admit -> queries -> prefixes -> trigger
        scoring -> generation -> retire, over `batch` slots.

        on_result(key, result): optional callback fired the moment a
        stream retires (completion order — callers wanting dataset order
        buffer and reorder). max_frames: per-call frames-buffer length
        (defaults to the instance setting).

        Live feeding: `items` may yield None, meaning "no request ready
        right now — keep serving the occupied slots". Admission for the
        iteration stops at the first None; the slot is retried next
        iteration. The iterator must still raise StopIteration to end the
        session (a forever-None feeder never terminates the loop; with no
        occupied slots the loop naps briefly between polls instead of
        spinning). This is how `aha serve` drives the server from a stdin
        request stream whose decode thread may lag the chip.

        stats: optional dict accumulating a wall-clock phase split —
        admit_s (encode + H2D + slot reset), text_s (query/prefix
        appends), score_s (trigger scoring incl. its host sync), gen_s
        (batched generation incl. sync), host_s (python bookkeeping),
        plus counters (iterations, score_dispatches, gen_dispatches,
        frames_scored, tokens_generated). Phase ends force a tiny device
        sync so the attribution is honest; only enable when profiling."""
        import time as _time

        max_frames = max_frames or getattr(self, "max_frames", None)
        assert max_frames, "max_frames required (ctor or call)"
        a = self.args
        B = self.batch
        eng = self.engine
        cfg = self.cfg
        it = iter(items)
        exhausted = False

        def _tick(name, t0, sync=None):
            if stats is None:
                return
            if sync is not None:
                jax.device_get(sync)
            stats[name] = stats.get(name, 0.0) + (_time.perf_counter() - t0)

        def _count(name, n=1):
            if stats is not None:
                stats[name] = stats.get(name, 0) + n

        frames_buf = jnp.zeros(
            (B, max_frames, cfg.frame_num_tokens, cfg.llm.hidden_size),
            jnp.dtype(cfg.dtype))
        cache = eng.new_cache()
        counts = eng.new_rep_counts()

        occupied = [False] * B
        key = [None] * B
        # z-rule device state (persist across iterations; rows reset on
        # admission). Cheap dead weight when the rule is off (z_thr=inf).
        z_hist, z_cnt = eng.new_z_state(
            window=max(int(a.running_list_length or 20), 2))
        first_n = int(a.first_n_frames_no_generate or 0)
        # response_min_interval_frames: per-row first-eligible-frame gate
        # (constant within a program — responses land at host boundaries)
        min_int = getattr(a, "response_min_interval_frames", None)
        resume_at = np.zeros(B, np.int64)
        # per-row trigger thresholds — run-local like every other slot
        # state (an aborted run must not leak request overrides into the
        # next); inf disables a criterion for a row
        prob_thr = np.full(B, self._default_prob, np.float64)
        sum_thr = np.full(B, self._default_sum, np.float64)
        z_thr = np.full(B, self._default_z, np.float64)
        T = np.zeros(B, np.int64)
        i = np.zeros(B, np.int64)
        score_sum = np.zeros(B, np.float64)
        last_role = ["system"] * B
        # per-row draft context for speculative decoding: recent
        # conversation text (query ids, earlier response ids), newest
        # last, capped at 128 tokens. Pure n-gram draft source — never
        # fed to the model, cannot change any output byte.
        CTX = 128
        ctx_ids = np.zeros((B, CTX), np.int32)
        ctx_len = np.zeros(B, np.int32)

        def push_ctx(b, ids):
            ids = np.asarray(ids, np.int32).ravel()
            if ids.size >= CTX:
                ctx_ids[b] = ids[-CTX:]
                ctx_len[b] = CTX
                return
            n = int(ctx_len[b])
            keep = min(n, CTX - ids.size)
            if keep < n:
                ctx_ids[b, :keep] = ctx_ids[b, n - keep:n]
            ctx_ids[b, keep:keep + ids.size] = ids
            ctx_len[b] = keep + ids.size
        init_vision = [False] * B
        pending_last: list[list[int]] = [[] for _ in range(B)]
        queries: list[list[dict]] = [[] for _ in range(B)]
        q_ptr = [0] * B
        responses: list[list[dict]] = [[] for _ in range(B)]
        debug: list[list[dict]] = [[] for _ in range(B)]
        results: dict = {}

        def query_due(b):
            return (q_ptr[b] < len(queries[b])
                    and i[b] / fps >= queries[b][q_ptr[b]]["time"])

        # shared host bookkeeping for the production (fused serve_step) and
        # instrumented (per-phase sync) branches below — ONE copy so the
        # trigger/response/retire semantics cannot drift between them

        def absorb_scores(i_new, s_host):
            """Fold fetched per-frame scores into debug traces and advance i."""
            for b in range(B):
                if not occupied[b]:
                    continue
                if i_new[b] > i[b]:
                    last_role[b] = "stream"
                for t in range(int(i[b]), int(i_new[b])):
                    debug[b].append(dict(
                        time=t / fps,
                        informative_score=float(s_host[b, t, 0]),
                        relevance_score=float(s_host[b, t, 1]),
                        uncertainty_score=float(s_host[b, t, 2]),
                    ))
                i[b] = i_new[b]

        def absorb_responses(triggered, out_ids, out_len, last_tok):
            """Decode + record generations for the triggered rows."""
            out_ids = np.asarray(out_ids)
            out_len = np.asarray(out_len)
            last_tok = np.asarray(last_tok)
            for b in range(B):
                if not triggered[b]:
                    continue
                n = int(out_len[b])
                push_ctx(b, out_ids[b, :n])   # answers seed later drafts
                text = self.tokenizer.decode(
                    out_ids[b, :n], skip_special_tokens=True)
                responses[b].append({
                    "time": (int(i[b]) - 1) / fps,
                    "content": text, "role": "assistant",
                })
                # the reference flips last_role UNCONDITIONALLY
                # (test/inference.py:280) — under remove_assistant_turns
                # this only affects the NEXT query's
                # add_stream_query_prompt rendering
                last_role[b] = "assistant"
                if min_int is not None:
                    resume_at[b] = int(i[b]) - 1 + int(min_int)
                if not a.remove_assistant_turns:
                    pending_last[b] = [int(last_tok[b])]

        def retire():
            """Finish streams whose frames ran out; slots free for admits."""
            for b in range(B):
                if occupied[b] and i[b] >= T[b]:
                    results[key[b]] = {
                        "responses": sorted(responses[b],
                                            key=lambda x: x["time"]),
                        "debug_data": debug[b]}
                    occupied[b] = False
                    if on_result is not None:
                        on_result(key[b], results[key[b]])

        # per-response latency: serving-iteration start (post-admission) ->
        # response text decoded on the host. The trigger fires ON DEVICE
        # mid-program and nothing is host-observable before the dispatch
        # returns, so this is the honest user-facing trigger->text quantity
        # (an upper bound on "time since the triggering frame": it includes
        # the pre-trigger frames the same dispatch scored). retire_defer>1
        # lengthens iterations — its throughput gain is priced in exactly
        # here (scripts/perf/ab_batched_retirement.py's latency column).
        resp_lat: list[float] = []
        self.last_response_latency_s = resp_lat

        while True:
            _count("iterations")
            _t0 = _time.perf_counter() if stats is not None else 0.0
            # 0. admit waiting streams into free slots
            admit = np.zeros(B, bool)
            starved = False      # feeder yielded None: stop admitting
            for b in range(B):
                if occupied[b] or starved:
                    continue
                while not exhausted:
                    try:
                        item = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    if item is None:
                        starved = True
                        break
                    k, video, conv, *rest = item
                    opts = rest[0] if rest else None
                    user_turns = sorted(
                        [t for t in conv if t.get("role") == "user"],
                        key=lambda t: t["time"])
                    if video is None or video.shape[0] == 0:
                        results[k] = {
                            "responses": [
                                {"time": t["time"], "content": t["content"],
                                 "role": "user"} for t in user_turns],
                            "debug_data": []}
                        if on_result is not None:
                            on_result(k, results[k])
                        continue
                    n = video.shape[0]
                    assert n <= max_frames, (n, max_frames)
                    emb = eng.encode_frames(video)            # [n, F, H]
                    row = jnp.zeros((max_frames, *emb.shape[1:]),
                                    frames_buf.dtype)
                    row = row.at[:n].set(emb.astype(frames_buf.dtype))
                    frames_buf = _admit_row(frames_buf, row, jnp.int32(b))
                    occupied[b] = True
                    key[b] = k
                    T[b], i[b], score_sum[b] = n, 0, 0.0
                    prob_thr[b] = self._default_prob
                    sum_thr[b] = self._default_sum
                    z_thr[b] = self._default_z
                    z_hist = z_hist.at[b].set(0.0)
                    z_cnt = z_cnt.at[b].set(0)
                    resume_at[b] = 0
                    _THR_KEYS = ("stream_end_prob_threshold",
                                 "stream_end_score_sum_threshold",
                                 "threshold_z")
                    if opts and any(kk in opts for kk in _THR_KEYS):
                        # a request carrying ANY trigger key fully defines
                        # its stream's rule set (one-process-per-stream
                        # equivalence: a reference process has exactly the
                        # rules it was launched with — never the server
                        # default OR'd in). Unspecified/None = disabled.
                        prob_thr[b] = np.inf
                        sum_thr[b] = np.inf
                        z_thr[b] = np.inf
                        if opts.get("stream_end_prob_threshold") is not None:
                            prob_thr[b] = float(
                                opts["stream_end_prob_threshold"])
                        if opts.get("stream_end_score_sum_threshold") is not None:
                            sum_thr[b] = float(
                                opts["stream_end_score_sum_threshold"])
                        if opts.get("threshold_z") is not None:
                            z_thr[b] = float(opts["threshold_z"])
                    last_role[b], init_vision[b] = "system", False
                    pending_last[b] = []
                    ctx_ids[b] = 0
                    ctx_len[b] = 0
                    queries[b], q_ptr[b] = user_turns, 0
                    responses[b] = [
                        {"time": t["time"], "content": t["content"],
                         "role": "user"} for t in user_turns]
                    debug[b] = []
                    admit[b] = True
                    break
            if admit.any():
                cache = eng.reset_cache_rows(cache, admit)
                counts = counts * jnp.asarray(~admit, counts.dtype)[:, None]
            _tick("admit_s", _t0, sync=cache.seen)
            if not any(occupied):
                if exhausted:
                    break
                _time.sleep(0.005)   # idle poll: feeder momentarily empty
                continue
            iter_t0 = _time.perf_counter()   # response-latency anchor

            _t0 = _time.perf_counter() if stats is not None else 0.0
            # 1. queries due now (per-row ragged chunk; [] rows are no-ops)
            q_rows = [[] for _ in range(B)]
            any_q = False
            for b in range(B):
                if occupied[b] and i[b] < T[b] and query_due(b):
                    q = queries[b][q_ptr[b]]
                    q_rows[b] = self.tokenizer.apply_chat_template(
                        [{"role": "user", "content": q["content"]}],
                        add_stream_query_prompt=last_role[b] == "stream",
                        add_stream_prompt=True,
                    )
                    q_ptr[b] += 1
                    last_role[b] = "user"
                    push_ctx(b, q_rows[b])
                    any_q = True
            if any_q:
                cache, _ = eng.append_ids(cache, q_rows)

            # 2. per-row frame limit: own length or next query boundary.
            # A row that just took a query whose successor is due at the
            # SAME time still advances one frame first — the reference
            # encodes one query per frame step (`if`, not `while`,
            # inference.py:294), so the order is q1, frame, q2, frame.
            limit = np.where(occupied, T, 0)
            for b in range(B):
                if occupied[b] and q_ptr[b] < len(queries[b]):
                    boundary = int(np.ceil(queries[b][q_ptr[b]]["time"] * fps))
                    floor = i[b] + (1 if q_rows[b] else 0)
                    limit[b] = min(limit[b], max(boundary, floor))

            # 3a. rows owing a role-transition prefix take their next frame
            # as a FUSED [prefix + frame] chunk — the reference's forward
            # boundary, semantic under mask_mode='hf' once the window fills.
            # Rows without a prefix advance one normal frame in the same
            # batched step (no wasted weight pass).
            p_rows = [[] for _ in range(B)]
            any_p = False
            for b in range(B):
                if not occupied[b] or i[b] >= T[b]:
                    continue
                if not init_vision[b]:
                    p_rows[b] = list(self._start_ids)
                    init_vision[b] = True
                elif last_role[b] == "assistant" and not a.remove_assistant_turns:
                    p_rows[b] = pending_last[b] + list(self._stream_prompt_ids)
                if p_rows[b]:
                    any_p = True

            if stats is None:
                # production path: ONE program per iteration — fused
                # prefix+frame step with its trigger rule evaluated on
                # device, the batched trigger loop, and generation for the
                # triggered subset (engine.serve_step). One dispatch + one
                # fetch instead of three syncs; remove_assistant_turns
                # callers generate host-side below so the post-scoring
                # cache survives as the rollback point.
                can_step = np.asarray(occupied) & (i < limit)
                do_gen = not a.remove_assistant_turns
                (cache, scores_dev, i_dev, sum_dev, trig_dev, out_ids,
                 out_len, counts, last_tok, z_hist, z_cnt) = eng.serve_step(
                    cache, p_rows, can_step, frames_buf, i, limit,
                    score_sum, counts, prob_thr,
                    sum_thr,
                    tuple(a.score_heads), self._gen_prompt_ids,
                    do_generate=do_gen, z_threshold=z_thr,
                    z_state=(z_hist, z_cnt), first_n_frames=first_n,
                    resume_at=resume_at, ctx=(ctx_ids, ctx_len),
                    retire_defer=self.retire_defer)
                (i_new, triggered, s_host, new_sum, out_ids, out_len,
                 last_tok) = jax.device_get(
                    (i_dev, trig_dev, scores_dev, sum_dev, out_ids,
                     out_len, last_tok))
                i_new = np.asarray(i_new, np.int64)
                triggered = np.asarray(triggered, bool) & np.asarray(occupied)
                s_host = np.asarray(s_host, np.float64)
                score_sum = np.where(occupied,
                                     np.asarray(new_sum, np.float64),
                                     score_sum)
                absorb_scores(i_new, s_host)
                if triggered.any():
                    if a.remove_assistant_turns:
                        # rollback semantics: generate on the non-donating
                        # path and keep the pre-generation (post-scoring)
                        # cache
                        pre_cache = cache
                        g_rows = [list(self._gen_prompt_ids) if triggered[b]
                                  else [] for b in range(B)]
                        _, out_ids, out_len, counts, last_tok = eng.generate(
                            cache, g_rows, counts,
                            active=jnp.asarray(triggered),
                            ctx=(jnp.asarray(ctx_ids),
                                 jnp.asarray(ctx_len)))
                        cache = pre_cache
                        out_ids, out_len, last_tok = jax.device_get(
                            (out_ids, out_len, last_tok))
                    absorb_responses(triggered, out_ids, out_len, last_tok)
                    lat = _time.perf_counter() - iter_t0
                    resp_lat.extend([lat] * int(triggered.sum()))
                retire()
                continue

            # instrumented path (stats != None): per-phase dispatches with
            # honest sync boundaries — slower, but decomposes the wall
            # clock the fused program above hides
            fused_triggered = np.zeros(B, bool)
            if any_p:
                can_step = np.asarray(occupied) & (i < limit)
                idx = np.minimum(i, T - 1)
                fe = frames_buf[jnp.arange(B), jnp.asarray(idx)]   # [B, F, H]
                cache, s = eng.append_text_frames(
                    cache, p_rows, fe, active=jnp.asarray(can_step))
                s_host0 = np.asarray(jax.device_get(s), np.float64)
                heads = a.score_heads
                # z-rule host mirror: the frame this fused step scores must
                # still enter every row's z window (engine.z_step pushes for
                # ALL active rows, firing or not), or the device loop below
                # would run on a stale window. Only materialize the state
                # when some row actually runs the rule — the fetch costs a
                # sync this honest-attribution path can afford, but non-z
                # workloads keep their exact previous timing.
                use_z = bool(np.isfinite(z_thr).any())
                if use_z:
                    zh_np, zc_np = jax.device_get((z_hist, z_cnt))
                    zh_np = np.array(zh_np, np.float32)
                    zc_np = np.array(zc_np, np.int32)
                for b in range(B):
                    if not can_step[b]:
                        continue
                    stream_end = sum(v for key, v in (
                        ("informative_score", float(s_host0[b, 0])),
                        ("relevance_score", float(s_host0[b, 1])),
                    ) if key in heads)
                    score_sum[b] += stream_end
                    ok = i[b] >= resume_at[b]
                    if ok and score_sum[b] > sum_thr[b]:
                        fused_triggered[b] = True
                        score_sum[b] = 0.0
                    if ok and stream_end > prob_thr[b]:
                        fused_triggered[b] = True
                    if use_z:
                        fire = z_step_host(zh_np, zc_np, b, stream_end,
                                           z_thr[b], first_n)
                        if ok and fire:
                            fused_triggered[b] = True
                    debug[b].append(dict(
                        time=int(i[b]) / fps,
                        informative_score=float(s_host0[b, 0]),
                        relevance_score=float(s_host0[b, 1]),
                        uncertainty_score=float(s_host0[b, 2]),
                    ))
                    i[b] += 1
                    last_role[b] = "stream"
                    _count("frames_scored")
                if use_z:
                    z_hist = jnp.asarray(zh_np)
                    z_cnt = jnp.asarray(zc_np)
                # triggered rows stop here this round (their generation runs
                # below); everyone else continues in the on-device loop
                limit = np.where(fused_triggered, i, limit)
            _tick("text_s", _t0, sync=cache.seen)

            _t0 = _time.perf_counter() if stats is not None else 0.0
            (cache, scores, i_new, new_sum, triggered, z_hist,
             z_cnt) = eng.score_until_trigger_multi(
                    cache, frames_buf, i, limit, score_sum,
                    prob_thr,
                    sum_thr,
                    tuple(a.score_heads),
                    z_threshold=z_thr, z_state=(z_hist, z_cnt),
                    first_n_frames=first_n, resume_at=resume_at,
                )
            # one batched fetch: 4 separate device_gets would pay the
            # dispatch RTT 4x (the axon tunnel charges ~40 ms per sync)
            i_new, triggered, s_host, new_sum = jax.device_get(
                (i_new, triggered, scores, new_sum))
            i_new = np.asarray(i_new, np.int64)
            triggered = ((np.asarray(triggered, bool) | fused_triggered)
                         & np.asarray(occupied))
            s_host = np.asarray(s_host, np.float64)
            score_sum = np.where(occupied, np.asarray(new_sum, np.float64),
                                 score_sum)
            _count("score_dispatches")
            _count("frames_scored", int((i_new - i).sum()))
            _tick("score_s", _t0)
            _t0 = _time.perf_counter() if stats is not None else 0.0
            absorb_scores(i_new, s_host)
            _tick("host_s", _t0)

            # 4. batched generation for the triggered subset
            if triggered.any():
                _t0 = _time.perf_counter() if stats is not None else 0.0
                pre_cache = cache
                g_rows = [list(self._gen_prompt_ids) if triggered[b] else []
                          for b in range(B)]
                gen_cache, out_ids, out_len, counts, last_tok = \
                    eng.generate(cache, g_rows, counts,
                                 active=jnp.asarray(triggered),
                                 ctx=(jnp.asarray(ctx_ids),
                                      jnp.asarray(ctx_len)))
                cache = pre_cache if a.remove_assistant_turns else gen_cache
                out_ids, out_len, last_tok = jax.device_get(
                    (out_ids, out_len, last_tok))
                out_len = np.asarray(out_len)
                _count("gen_dispatches")
                _count("tokens_generated", int(out_len[triggered].sum()))
                _tick("gen_s", _t0)
                absorb_responses(triggered, out_ids, out_len, last_tok)
                lat = _time.perf_counter() - iter_t0
                resp_lat.extend([lat] * int(triggered.sum()))

            # 5. retire finished streams (slot frees for the next admit)
            retire()

        if stats is not None and resp_lat:
            ls = self.latency_stats()
            stats["response_lat_p50_ms"] = ls["p50_ms"]
            stats["response_lat_p99_ms"] = ls["p99_ms"]
            stats["n_responses"] = ls["n_responses"]
        return results

    def latency_stats(self) -> dict:
        """Per-response trigger->text-on-host latency of the LAST
        run/run_items call: p50/p99/mean ms over all responses (see the
        resp_lat comment in run_items for the exact definition). Empty
        run or no responses -> {"n_responses": 0}."""
        lat = np.asarray(getattr(self, "last_response_latency_s", ()) or (),
                         np.float64)
        if lat.size == 0:
            return {"n_responses": 0}
        return {
            "n_responses": int(lat.size),
            "p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
            "p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
            "mean_ms": round(float(lat.mean()) * 1e3, 2),
        }


class MultiStreamServer(MultiStreamSession):
    """Continuous batching over ``batch`` slots (see module docstring).

    API: ``run_items(items, fps)`` with ``items`` an iterable of
    ``(key, video, conversation)``; returns ``{key: {"responses",
    "debug_data"}}``. Streams are admitted in order as slots free; a slot is
    recycled with a per-row cache reset, so each stream's outputs equal an
    independent :class:`StreamSession`'s (tests/test_multi_stream.py).
    """

    def __init__(self, params, cfg, tokenizer, infer_cfg, *, batch,
                 max_frames, engine=None, lora=None, lora_scale=0.0,
                 mesh=None):
        super().__init__(params, cfg, tokenizer, infer_cfg, batch=batch,
                         engine=engine, lora=lora, lora_scale=lora_scale,
                         mesh=mesh)
        self.max_frames = max_frames

"""StreamSession: the stateful streaming-inference session.

Host-side state machine with the exact API and decision semantics of the
reference's `LiveInferForBenchmark` / `LiveInferForDemo`
(`/root/reference/test/inference.py:38-348`,
`/root/reference/test/live_infer_for_video.py:80-228`):

  * ``reset`` / ``set_fps`` / ``input_video_stream`` / ``input_query_stream``
    / ``inference`` — the benchmark loop,
  * ``input_one_frame`` / ``encode_given_query`` — the interactive demo API
    (push one frame, get scores and maybe a response),
  * ``score_video`` — TPU fast path: when no generation can trigger
    (grounding mode), all frames are scored in one jitted ``lax.scan`` with
    zero per-frame host syncs.

All tensor work lives in :class:`~aha_tpu.streaming.engine.StreamEngine`;
this class only sequences chunks and applies the trigger policy.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.config import AhaConfig, InferConfig
from aha_tpu.ops.kv_cache import CachePolicy
from aha_tpu.streaming.engine import StreamEngine
from aha_tpu.tokenization import StreamTokenizer


class StreamSession:
    def __init__(
        self,
        engine: StreamEngine,
        tokenizer: StreamTokenizer,
        infer_cfg: InferConfig,
    ):
        infer_cfg.validate()
        self.engine = engine
        self.tokenizer = tokenizer
        self.args = infer_cfg
        self.cfg: AhaConfig = engine.cfg

        self.system_prompt = infer_cfg.system_prompt
        self.score_heads = list(infer_cfg.score_heads)
        self.stream_end_prob_threshold = infer_cfg.stream_end_prob_threshold
        self.stream_end_score_sum_threshold = infer_cfg.stream_end_score_sum_threshold
        self.threshold_z = infer_cfg.threshold_z
        self.response_min_interval_frames = getattr(
            infer_cfg, "response_min_interval_frames", None)
        self.first_n_frames_no_generate = infer_cfg.first_n_frames_no_generate
        self.running_list_length = infer_cfg.running_list_length
        self.remove_assistant_turns = infer_cfg.remove_assistant_turns

        # precomputed template id chunks (ref: test/inference.py:92-94)
        tok = tokenizer
        self._start_ids = tok.apply_chat_template(
            [{"role": "system", "content": self.system_prompt}]
        )
        self._added_stream_prompt_ids = tok.apply_chat_template([{}], add_stream_prompt=True)
        self._added_stream_generation_ids = tok.apply_chat_template(
            [{}], add_stream_generation_prompt=True
        )

        self.frame_fps: float | None = None
        self.frame_interval: float | None = None
        if infer_cfg.frame_fps and infer_cfg.frame_fps > 0:
            self.set_fps(infer_cfg.frame_fps)
        self.reset()

    # ------------------------------------------------------------------
    # Session state (ref: test/inference.py:105-131)
    # ------------------------------------------------------------------

    def set_fps(self, fps: float | None = None, frame_interval: float | None = None):
        assert (fps is None) != (frame_interval is None)
        if fps is not None:
            self.frame_fps = fps
            self.frame_interval = 1.0 / fps
        else:
            self.frame_interval = frame_interval
            self.frame_fps = 1.0 / frame_interval

    def reset(self):
        self.query_queue: collections.deque = collections.deque()
        self.frame_embeds_queue: collections.deque = collections.deque()
        self.video_time = 0.0
        self.frame_idx = 0
        self.last_role = "system"
        self.init_vision_time = False
        self.num_frames_no_reply = 0
        self.stream_end_prob_list: list[float] = []
        # device-side z window for the chunked loop (lazy; engine batch=1)
        self._z_state = None
        self.stream_end_score_sum = 0.0
        self.last_response_frame: int | None = None
        self.consecutive_n_frames = 0
        self.debug_data_list: list[dict] = []
        self._pending_last_ids: list[int] = []
        # draft context for speculative decoding: recent conversation text
        # (query ids, earlier response ids), most-recent-last, capped at
        # 128 tokens. Pure n-gram draft source — never fed to the model.
        self._draft_ctx: list[int] = []
        # reuse the allocated ring buffer across videos (metadata-only reset;
        # a fresh new_cache() would churn ~120 MB of HBM per video on the 7B
        # and defeat donation in multi-video drivers)
        if getattr(self, "cache", None) is not None:
            self.cache = self.engine.reset_cache(self.cache)
        else:
            self.cache = self.engine.new_cache()
        self.rep_counts = self.engine.new_rep_counts()

    # ------------------------------------------------------------------
    # Inputs
    # ------------------------------------------------------------------

    def input_video_stream(self, video_frames: np.ndarray):
        """Pre-encode all frames ([T, H, W, 3] pixels) into the frame queue
        (ref: test/inference.py:169-187). Embeds stay on device."""
        embeds = self.engine.encode_frames(video_frames)  # [T, F, H]
        for r in range(embeds.shape[0]):
            self.frame_embeds_queue.append((r / self.frame_fps, embeds[r]))

    def input_frame_embeds(self, frame_embeds, time: float):
        """Push one pre-encoded frame ([F, H]) — demo path."""
        self.frame_embeds_queue.append((time, frame_embeds))

    def input_query_stream(self, conversation: list[dict]):
        for turn in conversation:
            if turn["role"] == "user":
                self.query_queue.append((turn["time"], turn["content"]))

    # ------------------------------------------------------------------
    # Chunk encoders (ref: test/inference.py:196-281)
    # ------------------------------------------------------------------

    def _encode_frame(self):
        if not self.frame_embeds_queue:
            return None, None
        video_time, frame_embeds = self.frame_embeds_queue.popleft()

        # role-transition ids exactly as the reference chooses them
        if not self.init_vision_time:
            prefix_ids = self._start_ids
            self.init_vision_time = True
        elif self.last_role == "assistant" and not self.remove_assistant_turns:
            # the response's final token (usually eos) was produced but never
            # fed through the decoder; it leads the next chunk, exactly like
            # the ref's `cat([last_ids, _added_stream_prompt_ids])`
            # (test/inference.py:207-208)
            prefix_ids = self._pending_last_ids + self._added_stream_prompt_ids
        else:
            prefix_ids = []
        if prefix_ids:
            # prefix + frame in ONE chunk, the reference's forward boundary
            # (semantic under mask_mode='hf' once the window is full)
            self.cache, scores = self.engine.append_text_frames(
                self.cache, [prefix_ids], frame_embeds[None])
        else:
            self.cache, scores = self.engine.append_frames(
                self.cache, frame_embeds[None])

        self.frame_idx += 1
        self.num_frames_no_reply += 1
        self.last_role = "stream"
        info, rel, unc = (float(x) for x in jax.device_get(scores[0]))
        return {"informative_score": info, "relevance_score": rel}, unc

    def _encode_query(self):
        query_time, query = self.query_queue.popleft()
        query_ids = self.tokenizer.apply_chat_template(
            [{"role": "user", "content": query}],
            add_stream_query_prompt=self.last_role == "stream",
            add_stream_prompt=True,
        )
        self.cache, _ = self.engine.append_ids(self.cache, [query_ids])
        self._push_draft_ctx(query_ids)
        self.last_role = "user"

    def encode_given_query(self, query: str):
        """Demo API (ref: live_infer_for_video.py:88-94)."""
        self.query_queue.append((self.video_time, query))
        self._encode_query()

    _DRAFT_CTX_TOKENS = 128

    def _push_draft_ctx(self, ids):
        self._draft_ctx.extend(int(t) for t in ids)
        self._draft_ctx = self._draft_ctx[-self._DRAFT_CTX_TOKENS:]

    def _draft_ctx_arrays(self):
        """(ctx_ids [1, 128], ctx_len [1]) for engine.generate — the
        speculative drafter's lookup context (fixed width: one compiled
        shape)."""
        C = self._DRAFT_CTX_TOKENS
        ids = np.zeros((1, C), np.int32)
        n = len(self._draft_ctx)
        ids[0, :n] = self._draft_ctx
        return jnp.asarray(ids), jnp.asarray([n], jnp.int32)

    def _generate_response(self) -> str:
        pre_cache = self.cache
        cache, out_ids, out_len, counts, last_tok = self.engine.generate(
            self.cache, [self._added_stream_generation_ids], self.rep_counts,
            ctx=self._draft_ctx_arrays(),
        )
        self.rep_counts = counts
        if not self.remove_assistant_turns:
            self.cache = cache
            self._pending_last_ids = [int(last_tok[0])]
        else:
            # roll back the KV to the pre-response state
            # (ref remove_assistant_turns, test/inference.py:272-276)
            self.cache = pre_cache
        n = int(out_len[0])
        ids = np.asarray(out_ids[0, :n])
        response = self.tokenizer.decode(ids, skip_special_tokens=True)
        self._push_draft_ctx(ids)   # earlier answers seed later drafts
        self.num_frames_no_reply = 0
        self.last_role = "assistant"
        return response

    # ------------------------------------------------------------------
    # Decision policy (ref: test/inference.py:304-328)
    # ------------------------------------------------------------------

    def _check_trigger(self, video_scores: dict) -> bool:
        need_response = False
        stream_end_score = sum(v for k, v in video_scores.items() if k in self.score_heads)
        self.stream_end_prob_list.append(stream_end_score)
        self.stream_end_score_sum += stream_end_score
        if isinstance(self.running_list_length, int) and self.running_list_length > 0:
            self.stream_end_prob_list = self.stream_end_prob_list[-self.running_list_length:]
        # response_min_interval_frames (ref accepts the flag but never
        # evaluates it, test/inference.py:75,621 — mirror of threshold_z):
        # suppressed frames fire nothing and do NOT reset the running sum
        eligible = self._trigger_eligible(self.frame_idx - 1)
        if (
            self.stream_end_score_sum_threshold is not None
            and self.stream_end_score_sum > self.stream_end_score_sum_threshold
            and eligible
        ):
            need_response = True
            self.stream_end_score_sum = 0
        if (
            self.stream_end_prob_threshold is not None
            and stream_end_score > self.stream_end_prob_threshold
            and eligible
        ):
            need_response = True
        if (self.threshold_z is not None and eligible
                and self._z_trigger(stream_end_score)):
            need_response = True
        if need_response:
            self.last_response_frame = self.frame_idx - 1
        return need_response

    def _trigger_eligible(self, frame: int) -> bool:
        """response_min_interval_frames gate: frame may fire only when at
        least N frames have passed since the previous response's frame."""
        n = self.response_min_interval_frames
        if n is None or self.last_response_frame is None:
            return True
        return frame - self.last_response_frame >= n

    def _z_trigger(self, stream_end_score: float) -> bool:
        """z-score stopping rule. The reference accepts/validates the flag
        (test/inference.py:76,84-87: requires first_n_frames_no_generate,
        keeps a running list of length running_list_length) but its main
        loop never evaluates it — this implements the rule those knobs
        describe: fire when the current score is more than threshold_z
        standard deviations above the running-list mean, once
        first_n_frames_no_generate frames have been scored.

        The window statistics are computed in FLOAT32, matching the device
        rule (`engine.z_step`) and its numpy mirror (`engine.z_step_host`)
        term-for-term: f32 scores, mean/var over the truncated window, 1e-6
        std floor. All three implementations therefore agree bit-for-bit up
        to XLA's f32 reduction order — near-threshold decisions carry an f32
        tolerance, not an f64 one (parity:
        tests/test_streaming.py::test_chunked_inference_threshold_z_matches_stepwise)."""
        hist = self.stream_end_prob_list  # includes the current score
        if self.frame_idx < max(self.first_n_frames_no_generate, 2) or len(hist) < 2:
            return False
        w = np.asarray(hist, np.float32)
        nf = np.float32(len(w))
        mean = np.float32(w.sum(dtype=np.float32) / nf)
        var = np.float32(((w - mean) ** 2).sum(dtype=np.float32) / nf)
        z = (np.float32(stream_end_score) - mean) / max(
            np.float32(np.sqrt(var)), np.float32(1e-6))
        return float(z) > float(self.threshold_z)

    # ------------------------------------------------------------------
    # Main loops
    # ------------------------------------------------------------------

    def inference(self, verbose: bool = False, chunked: bool = True) -> list[dict]:
        """The benchmark loop (ref: test/inference.py:283-334). Returns the
        conversation with generated assistant turns; per-frame score traces
        land in ``self.debug_data_list``.

        chunked=True (default) evaluates the trigger ON DEVICE and scores
        whole runs of frames per dispatch — identical outputs to the
        stepwise loop, one host round-trip per response instead of per
        frame. Prob/sum rules run through `engine.score_until_trigger`;
        threshold_z routes through the B=1 batched loop
        (`engine.score_until_trigger_multi`), whose z_step keeps the
        running-list window on device. chunked=False remains the
        per-frame comparability path."""
        if chunked:
            return self._inference_chunked()
        return self._inference_stepwise()

    def _inference_stepwise(self) -> list[dict]:
        model_response_list = [
            {"time": q[0], "content": q[1], "role": "user"} for q in self.query_queue
        ]
        while self.frame_embeds_queue:
            if self.query_queue and self.video_time >= self.query_queue[0][0]:
                self._encode_query()

            video_scores, uncertainty_score = self._encode_frame()
            self.debug_data_list.append(
                dict(time=self.video_time, **video_scores, uncertainty_score=uncertainty_score)
            )

            if self._check_trigger(video_scores):
                response = self._generate_response()
                model_response_list.append(
                    {"time": self.video_time, "content": response, "role": "assistant"}
                )
                self.num_frames_no_reply = 0
                self.consecutive_n_frames = 0

            self.video_time += 1.0 / self.frame_fps
        return sorted(model_response_list, key=lambda x: x["time"])

    def _frame_prefix_ids(self) -> list[int]:
        """Role-transition ids owed before the next frame (the ref's
        last_ids selection in _encode_frame)."""
        if not self.init_vision_time:
            self.init_vision_time = True
            return list(self._start_ids)
        if self.last_role == "assistant" and not self.remove_assistant_turns:
            return self._pending_last_ids + self._added_stream_prompt_ids
        return []

    def _z_dev(self):
        """Device z window for the chunked loop (lazy): ([1, L] hist,
        [1] count), L = the session's running-list length — the same
        state the multi-stream server threads through its trigger
        programs."""
        if self._z_state is None:
            self._z_state = self.engine.new_z_state(
                window=max(int(self.running_list_length or 20), 2))
        return self._z_state

    def _pad_chunk(self, embeds):
        """Pad a [T, F, H] chunk to a frame bucket (fused-aligned) so
        chunks of different lengths share one compiled multi-loop
        program (mirror of engine.score_until_trigger's bucketing)."""
        from aha_tpu.streaming.engine import _bucket

        T = embeds.shape[0]
        Tp = _bucket(max(T, 1),
                     (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096))
        ff = getattr(self.engine, "fused_frames", 1)
        if ff > 1 and Tp % ff:
            Tp += ff - Tp % ff
        if Tp > T:
            pad = jnp.zeros((Tp - T, *embeds.shape[1:]), embeds.dtype)
            embeds = jnp.concatenate([embeds, pad], axis=0)
        return embeds

    def _inference_chunked(self) -> list[dict]:
        import jax.numpy as jnp

        model_response_list = [
            {"time": q[0], "content": q[1], "role": "user"} for q in self.query_queue
        ]
        while self.frame_embeds_queue:
            if self.query_queue and self.video_time >= self.query_queue[0][0]:
                self._encode_query()

            # contiguous frames until the next query is due; always at
            # least ONE frame — the reference encodes one query per frame
            # step (`if`, not `while`, inference.py:294), so two queries
            # due at the same time interleave as q1, frame, q2, frame
            next_q = self.query_queue[0][0] if self.query_queue else None
            chunk: list = []
            times: list[float] = []
            t = self.video_time
            for time_f, emb in self.frame_embeds_queue:
                if chunk and next_q is not None and t >= next_q:
                    break
                chunk.append(emb)
                times.append(t)
                t += 1.0 / self.frame_fps
            for _ in chunk:
                self.frame_embeds_queue.popleft()

            embeds = jnp.stack(chunk)                    # [T, F, H]
            k = 0
            while k < len(chunk):
                prefix = self._frame_prefix_ids()
                if prefix:
                    # the frame right after a response (or the very first
                    # frame) carries its role-transition prefix IN THE SAME
                    # chunk — the reference's forward boundary, which is
                    # semantic under mask_mode='hf' once the window fills.
                    # One host-checked fused step, then back to the
                    # on-device loop for the run of prefix-free frames.
                    self.cache, s = self.engine.append_text_frames(
                        self.cache, [prefix], embeds[k][None])
                    s_host = np.asarray(jax.device_get(s), np.float64)
                    n = 1
                    stream_end = sum(v for key, v in (
                        ("informative_score", float(s_host[0, 0])),
                        ("relevance_score", float(s_host[0, 1])),
                    ) if key in self.score_heads)
                    self.stream_end_score_sum += stream_end
                    triggered = False
                    eligible = self._trigger_eligible(self.frame_idx)
                    if (self.stream_end_score_sum_threshold is not None
                            and self.stream_end_score_sum
                            > self.stream_end_score_sum_threshold
                            and eligible):
                        triggered = True
                        self.stream_end_score_sum = 0.0
                    if (self.stream_end_prob_threshold is not None
                            and stream_end > self.stream_end_prob_threshold
                            and eligible):
                        triggered = True
                    if self.threshold_z is not None:
                        # keep the device z window current for this
                        # host-checked frame (engine.z_step_host — the
                        # push happens whether or not the rule fires)
                        from aha_tpu.streaming.engine import z_step_host

                        zh, zc = self._z_dev()
                        zh_np = np.array(jax.device_get(zh), np.float32)
                        zc_np = np.array(jax.device_get(zc), np.int32)
                        fire = z_step_host(
                            zh_np, zc_np, 0, stream_end, self.threshold_z,
                            int(self.first_n_frames_no_generate or 0))
                        if eligible and fire:
                            triggered = True
                        self._z_state = (jnp.asarray(zh_np),
                                         jnp.asarray(zc_np))
                elif self.threshold_z is None:
                    resume_local = 0
                    if (self.response_min_interval_frames is not None
                            and self.last_response_frame is not None):
                        resume_local = (self.last_response_frame
                                        + self.response_min_interval_frames
                                        - self.frame_idx)
                    self.cache, scores, n, new_sum, triggered = \
                        self.engine.score_until_trigger(
                            self.cache, embeds[k:], len(chunk) - k,
                            self.stream_end_score_sum,
                            self.stream_end_prob_threshold,
                            self.stream_end_score_sum_threshold,
                            tuple(self.score_heads),
                            resume_at=resume_local,
                        )
                    n = int(n)
                    triggered = bool(triggered)
                    s_host = np.asarray(jax.device_get(scores[:n]), np.float64)
                    self.stream_end_score_sum = float(new_sum)
                else:
                    # z-rule run: the B=1 batched trigger loop keeps the
                    # running-list window on device (engine.z_step — the
                    # same program the multi-stream server runs), so solo
                    # threshold_z sessions score at fused chunk speed
                    # instead of one sync per frame. start=k scores the
                    # remainder of the chunk in place; scores come back at
                    # absolute chunk positions.
                    resume_abs = 0
                    if (self.response_min_interval_frames is not None
                            and self.last_response_frame is not None):
                        resume_abs = (k + self.last_response_frame
                                      + self.response_min_interval_frames
                                      - self.frame_idx)
                    emb_p = self._pad_chunk(embeds)
                    (self.cache, scores, i_next, new_sum, trig,
                     zh, zc) = self.engine.score_until_trigger_multi(
                        self.cache, emb_p[None], [k], [len(chunk)],
                        [self.stream_end_score_sum],
                        self.stream_end_prob_threshold,
                        self.stream_end_score_sum_threshold,
                        tuple(self.score_heads),
                        z_threshold=[self.threshold_z],
                        z_state=self._z_dev(),
                        first_n_frames=max(
                            int(self.first_n_frames_no_generate or 0), 0),
                        resume_at=[max(int(resume_abs), 0)],
                    )
                    self._z_state = (zh, zc)
                    i_host, trig_h, s_all, sum_h = jax.device_get(
                        (i_next, trig, scores, new_sum))
                    n = int(np.asarray(i_host)[0]) - k
                    triggered = bool(np.asarray(trig_h)[0])
                    s_host = np.asarray(s_all, np.float64)[0, k:k + n]
                    self.stream_end_score_sum = float(np.asarray(sum_h)[0])
                self.last_role = "stream"
                self.frame_idx += n
                self.num_frames_no_reply += n
                for j in range(n):
                    self.debug_data_list.append(dict(
                        time=times[k + j],
                        informative_score=float(s_host[j, 0]),
                        relevance_score=float(s_host[j, 1]),
                        uncertainty_score=float(s_host[j, 2]),
                    ))
                    self.stream_end_prob_list.append(
                        sum(v for key, v in (
                            ("informative_score", float(s_host[j, 0])),
                            ("relevance_score", float(s_host[j, 1])),
                        ) if key in self.score_heads)
                    )
                if isinstance(self.running_list_length, int) and self.running_list_length > 0:
                    self.stream_end_prob_list = self.stream_end_prob_list[-self.running_list_length:]
                k += n
                self.video_time = times[k - 1] + 1.0 / self.frame_fps if n else self.video_time
                if triggered:
                    self.last_response_frame = self.frame_idx - 1
                    self.video_time = times[k - 1]  # response stamped at the triggering frame
                    response = self._generate_response()
                    model_response_list.append(
                        {"time": self.video_time, "content": response, "role": "assistant"}
                    )
                    self.num_frames_no_reply = 0
                    self.consecutive_n_frames = 0
                    self.video_time = times[k - 1] + 1.0 / self.frame_fps
        return sorted(model_response_list, key=lambda x: x["time"])

    def input_one_frame(self) -> dict:
        """Interactive per-frame API (ref: live_infer_for_video.py:135-176)."""
        video_scores, uncertainty_score = self._encode_frame()
        ret = dict(
            frame_idx=self.frame_idx,
            time=round(self.video_time, 1),
            uncertainty_score=uncertainty_score,
            **video_scores,
        )
        if self._check_trigger(video_scores):
            ret["response"] = self._generate_response()
            self.consecutive_n_frames = 0
        else:
            ret["response"] = None
        self.video_time += 1.0 / self.frame_fps
        return ret

    def find_ticks(self, scores, fps: float | None = None, **kw) -> list[float]:
        """Highlight tick times from a score trace (demo API parity with
        LiveInferForDemo.find_ticks, live_infer_for_video.py:195-228)."""
        from aha_tpu.ops.signal import find_ticks as _find_ticks

        return _find_ticks(np.asarray(scores), fps or self.frame_fps, **kw)

    def offline_generate(self, video_frames: np.ndarray, question: str,
                         fps: float | None = None) -> str:
        """Offline (non-streaming) baseline: system + whole video + question
        -> one greedy answer. The analog of the reference's LLaVA-OneVision
        offline path (test/inference.py:910-951) running on the same model."""
        self.reset()
        if fps is not None:
            self.set_fps(fps=fps)
        self.cache, _ = self.engine.append_ids(self.cache, [self._start_ids])
        embeds = self.engine.encode_frames(video_frames)
        self.cache, _ = self.engine.score_stream(self.cache, embeds[None])
        q_ids = self.tokenizer.apply_chat_template(
            [{"role": "user", "content": question}],
            add_stream_query_prompt=True, add_generation_prompt=True,
        )
        cache, out_ids, out_len, counts, _ = self.engine.generate(
            self.cache, [q_ids], self.rep_counts
        )
        self.cache = cache
        self.rep_counts = counts
        n = int(out_len[0])
        return self.tokenizer.decode(np.asarray(out_ids[0, :n]), skip_special_tokens=True)

    # ------------------------------------------------------------------
    # TPU fast path: scan-scored stream (no generation possible)
    # ------------------------------------------------------------------

    def score_video(self, video_frames: np.ndarray, query: str | None = None) -> list[dict]:
        """Score a whole video in one jitted scan — the grounding/highlight
        path (tvsum/hisum/charades run with no generation triggers). Token
        sequencing matches `inference()` with an (optional) time-0 query:
        query chunk → system chunk → frames. Returns debug_data records."""
        if query is not None:
            # identical ordering quirk as the reference loop: a time-0 query
            # is encoded before the _start_ids/vision init (inference() step 1
            # precedes _encode_frame's init_vision_time branch)
            query_ids = self.tokenizer.apply_chat_template(
                [{"role": "user", "content": query}],
                add_stream_query_prompt=False,
                add_stream_prompt=True,
            )
            self.cache, _ = self.engine.append_ids(self.cache, [query_ids])
            self.last_role = "user"
        self.cache, _ = self.engine.append_ids(self.cache, [self._start_ids])
        self.init_vision_time = True

        embeds = self.engine.encode_frames(video_frames)      # [T, F, H]
        self.cache, scores = self.engine.score_stream(self.cache, embeds[None])
        scores = np.asarray(jax.device_get(scores[0]), np.float64)  # [T, 3]
        self.last_role = "stream"
        self.frame_idx += scores.shape[0]

        out = []
        for t in range(scores.shape[0]):
            out.append(
                dict(
                    time=self.video_time,
                    informative_score=float(scores[t, 0]),
                    relevance_score=float(scores[t, 1]),
                    uncertainty_score=float(scores[t, 2]),
                )
            )
            self.video_time += 1.0 / self.frame_fps
        self.debug_data_list.extend(out)
        return out


def build_session(
    params: dict,
    cfg: AhaConfig,
    tokenizer: StreamTokenizer,
    infer_cfg: InferConfig,
    *,
    lora: dict | None = None,
    lora_scale: float = 0.0,
) -> StreamSession:
    """Convenience constructor: InferConfig -> CachePolicy -> engine -> session
    (the reference's `_init_cache` dispatch, test/inference.py:133-155)."""
    import jax.numpy as jnp

    policy = CachePolicy(
        kind=infer_cfg.kv_cache_policy,
        window=infer_cfg.kv_window,
        num_sink=infer_cfg.num_sink_tokens,
        mask_mode=infer_cfg.kv_mask_mode,
    )
    engine = StreamEngine(
        params,
        cfg,
        policy,
        max_new_tokens=infer_cfg.max_new_tokens,
        repetition_penalty=infer_cfg.repetition_penalty,
        lora=lora,
        lora_scale=lora_scale,
        kv_dtype=jnp.int8 if infer_cfg.kv_cache_dtype == "int8" else None,
        spec_tokens=infer_cfg.spec_decode_tokens,
        spec_tokens_max=infer_cfg.spec_decode_tokens_max,
        fused_score_frames=infer_cfg.fused_score_frames,
    )
    return StreamSession(engine, tokenizer, infer_cfg)

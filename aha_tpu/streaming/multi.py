"""Multi-stream batched scoring: N concurrent video streams on one chip.

The production-serving design point (BASELINE.md config #5: 8 concurrent
hour-long streams): the batch dimension runs over sessions, so one pass of
the weight stream from HBM scores a frame for every stream — aggregate
throughput scales nearly linearly in the batch until compute-bound. The
reference processes one stream per process/GPU; this is the TPU-native
replacement.

Score-only mode (grounding/highlight workloads — no generation triggers).
Each stream gets its own query and length; ragged batches are padded and
masked with per-row active flags (finished rows write into the cache's
junk slot, never polluting attention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.config import AhaConfig, InferConfig
from aha_tpu.ops.kv_cache import CachePolicy
from aha_tpu.streaming.engine import StreamEngine
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
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.args = infer_cfg
        self.batch = batch
        policy = CachePolicy(
            kind=infer_cfg.kv_cache_policy,
            window=infer_cfg.kv_window,
            num_sink=infer_cfg.num_sink_tokens,
        )
        self.engine = StreamEngine(params, cfg, policy, batch=batch)

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

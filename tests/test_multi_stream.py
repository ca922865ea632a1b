"""Multi-stream batched scoring: each stream's scores must equal its
single-stream run (batching must not leak state across rows)."""

import numpy as np
import pytest

from aha_tpu.config import InferConfig, aha_tiny
from aha_tpu.models import aha
from aha_tpu.streaming.multi import MultiStreamScorer
from aha_tpu.streaming.session import build_session


@pytest.fixture(scope="module")
def model():
    cfg = aha_tiny(vocab_size=256)
    return aha.build_model_and_tokenizer(cfg, seed=0)


def _infer_cfg(cfg):
    return InferConfig(
        frame_fps=1.0, frame_resolution=cfg.frame_resolution,
        grounding_mode=True, kv_cache_policy="sink", kv_window=64,
        num_sink_tokens=4,
    )


@pytest.mark.slow
def test_multi_stream_matches_single(model):
    params, cfg, tok = model
    rng = np.random.default_rng(0)
    r = cfg.frame_resolution
    lengths = [6, 3, 9]
    videos = [rng.integers(0, 255, (n, r, r, 3), dtype=np.uint8) for n in lengths]
    queries = ["what is this?", None, "find the dog"]

    scorer = MultiStreamScorer(params, cfg, tok, _infer_cfg(cfg), batch=3)
    batched = scorer.score_videos(videos, queries, fps=1.0)
    assert [len(b) for b in batched] == lengths

    for i in range(3):
        sess = build_session(params, cfg, tok, _infer_cfg(cfg))
        single = sess.score_video(videos[i], query=queries[i])
        for a, b in zip(batched[i], single):
            for k in ("informative_score", "relevance_score", "uncertainty_score"):
                np.testing.assert_allclose(a[k], b[k], rtol=3e-4, atol=3e-5)

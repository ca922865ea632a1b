"""Replay a golden fixture recorded from real reference weights.

Skipped unless both exist:
  * tests/fixtures/golden_7b.npz         (scripts/make_golden_fixture.py)
  * $AHA_GOLDEN_WEIGHTS                  (converted checkpoint dir)

This is the VERDICT-r1 parity gate: per-frame info/rel/unc traces from the
TPU implementation must match the recorded reference traces within bf16
tolerance on identical fixed inputs. See docs/REAL_WEIGHTS.md.
"""

import os
import pathlib

import numpy as np
import pytest

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "golden_7b.npz"


@pytest.mark.slow
def test_golden_score_parity():
    weights = os.environ.get("AHA_GOLDEN_WEIGHTS")
    if not FIXTURE.exists() or not weights:
        pytest.skip("golden fixture / AHA_GOLDEN_WEIGHTS not available "
                    "(see docs/REAL_WEIGHTS.md)")
    from aha_tpu import config as C
    from aha_tpu.config import InferConfig
    from aha_tpu.models import aha
    from aha_tpu.streaming.session import build_session

    rec = np.load(FIXTURE, allow_pickle=False)
    cfg = C.aha_7b().replace(dtype="bfloat16")
    params, cfg, tok = aha.build_model_and_tokenizer(
        cfg, tokenizer_pretrained=weights, weights_path=weights)
    icfg = InferConfig(grounding_mode=True, frame_fps=1.0,
                       kv_cache_policy="sink", kv_window=2048,
                       num_sink_tokens=32)
    sess = build_session(params, cfg, tok, icfg)
    rows = sess.score_video(rec["frames"],
                            query="What is happening in this video?")
    ours = np.asarray(
        [[r["informative_score"], r["relevance_score"], r["uncertainty_score"]]
         for r in rows], np.float32)
    ref = rec["scores"]
    # bf16 forward + different accumulation orders: per-frame scores agree
    # to ~1e-2 absolute (scores live in [0, 1] / exp(logvar))
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=5e-2)

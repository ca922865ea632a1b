"""LLM-judge + MAGQA aggregation tests (tiny random judge; the judged score
value is arbitrary but the machinery — prefix cache reuse, span gating,
matrix assembly, in-span aggregation — is exact)."""

import numpy as np
import pytest

from aha_tpu.config import aha_tiny
from aha_tpu.eval import llm_judge
from aha_tpu.models import aha


class FakeEvaluator:
    """Deterministic judge: 5 for exact match, else 2. Counts calls."""

    def __init__(self):
        self.calls = []

    def evaluate(self, question, gold, pred):
        self.calls.append((question, gold, pred))
        return 5 if gold == pred else 2


def _examples():
    pred = [{
        "question_id": "q1",
        "model_response_list": [
            {"role": "user", "time": 0, "content": "what?"},
            {"role": "assistant", "time": 2.0, "content": "a dog"},
            {"role": "assistant", "time": 6.0, "content": "a dog"},
            {"role": "assistant", "time": 12.0, "content": "a cat"},
        ],
    }]
    gold = [{
        "question_id": "q1",
        "conversation": [{"role": "user", "content": "what?"}],
        "answer": [
            {"content": "a dog", "time": [0.0, 4.0]},
            {"content": "a cat", "time": [10.0, 14.0]},
        ],
    }]
    return pred, gold


def test_score_matrix_span_gating_and_dedup():
    pred, gold = _examples()
    ev = FakeEvaluator()
    out = llm_judge.magqa_score_matrices(pred, gold, ev)
    assert len(out) == 1
    m = np.asarray(out[0]["evaluator_output"])
    assert m.shape == (2, 3)
    # identical pred turns judged once per gold text
    judged_pairs = {(g, p) for _, g, p in ev.calls}
    assert ("a dog", "a dog") in judged_pairs
    assert ("a cat", "a cat") in judged_pairs
    # dog/dog pair in span [0,4] via time 2 -> both dog columns get 5
    assert m[0, 0] == 5 and m[0, 1] == 5
    # cat at t=12 in span [10,14] -> 5
    assert m[1, 2] == 5
    # out-of-span pairs keep the default 1
    assert m[1, 0] == 1 and m[0, 2] == 1


def test_analyze_magqa():
    pred, gold = _examples()
    out = llm_judge.magqa_score_matrices(pred, gold, FakeEvaluator())
    res = llm_judge.analyze_magqa(out, num_examples=1, pad_with_one=False)
    # gold 0 ('a dog', span [0,4]): in-span turns = turn0 (t=2) -> score 5
    # gold 1 ('a cat', span [10,14]): in-span = turn2 (t=12) -> 5
    assert res["in_span_score"] == 5.0
    assert res["turns"] == 3 and res["turns_dedup"] == 2


def test_openai_batch_roundtrip():
    pred, gold = _examples()
    reqs = llm_judge.to_openai_batch_input(pred, gold)
    # per-turn span gating: (g0,p0) via t=2 and (g1,p2) via t=12 only
    assert len(reqs) == 2
    assert all(r["body"]["messages"][0]["role"] == "system" for r in reqs)
    fake_responses = [
        {"custom_id": r["custom_id"],
         "response": {"body": {"choices": [{"message": {"content": "4"}}]}}}
        for r in reqs
    ]
    out = llm_judge.from_openai_batch_output(fake_responses, pred, gold)
    m = np.asarray(out[0]["evaluator_output"])
    assert m[0, 0] == 4 and m[1, 2] == 4
    assert m[0, 1] == 1 and m[1, 0] == 1


@pytest.mark.slow
def test_local_judge_runs():
    cfg = aha_tiny(vocab_size=256)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    judge = llm_judge.LocalJudge(params, cfg, tok, window=1024, max_new_tokens=4)
    score = judge.evaluate("what?", "a dog", "a dog")
    assert score in (1, 2, 3, 4, 5)
    # prefix cache untouched across evaluations (functional reuse)
    length_before = int(judge.prefix_cache.length[0])
    judge.evaluate("what?", "a cat", "a dog")
    assert int(judge.prefix_cache.length[0]) == length_before

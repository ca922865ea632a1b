"""Caption/dense-captioning/QVH metric tests. CIDEr and the SODA DP are
cross-checked against the reference's pure-python implementations loaded
straight from /root/reference (no torch needed for those modules)."""

import importlib.util
import random
import sys

import numpy as np
import pytest

from aha_tpu.eval import qvh, soda
from aha_tpu.eval.captioning import (
    Cider,
    Meteor,
    PTBTokenizer,
    meteor_sentence,
    ptb_tokenize_sentence,
)

rng = np.random.default_rng(0)

WORDS = ["a", "man", "rides", "his", "bike", "down", "the", "hill", "dog",
         "runs", "fast", "red", "car", "turns", "left", "cooking", "pasta"]


def random_sentence(n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


# ---------------------------------------------------------------------------
# CIDEr vs reference scorer
# ---------------------------------------------------------------------------


def _ref_cider(reference_root):
    path = reference_root / "test/dvc/metrics/cider_scorer.py"
    spec = importlib.util.spec_from_file_location("ref_cider_scorer", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_cider_scorer"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_cider_matches_reference(reference_root):
    ref = _ref_cider(reference_root)
    gts, res = {}, {}
    for i in range(12):
        key = str(i)
        gts[key] = [random_sentence(int(rng.integers(4, 12))) for _ in range(2)]
        res[key] = [random_sentence(int(rng.integers(4, 12)))]
    got_mean, got_scores = Cider().compute_score(gts, res)

    scorer = ref.CiderScorer(n=4, sigma=6.0)
    for key in sorted(gts.keys()):
        scorer += (res[key][0], gts[key])
    want_mean, want_scores = scorer.compute_score()
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-9)
    np.testing.assert_allclose(got_mean, want_mean, rtol=1e-9)


def test_cider_perfect_match_scores_highest():
    # a perfect hypothesis outscores a disjoint one within the same corpus
    gts = {"0": ["the dog runs fast"], "1": ["a man rides his bike"],
           "2": ["red car turns left"]}
    res = {"0": ["the dog runs fast"], "1": ["cooking pasta down hill"],
           "2": ["red car turns left"]}
    _, scores = Cider().compute_score(gts, res)
    assert scores[0] > scores[1]
    assert scores[0] > 1.0
    assert scores[1] == pytest.approx(0.0)


# ---------------------------------------------------------------------------
# METEOR-lite sanity
# ---------------------------------------------------------------------------


def test_meteor_properties():
    assert meteor_sentence("the dog runs", ["the dog runs"]) > 0.9
    assert meteor_sentence("xyz abc", ["the dog runs"]) == 0.0
    # stemming: running ~ runs share stem 'run'... (light stemmer: runs->run, running->runn)
    partial = meteor_sentence("the dog walks", ["the dog runs"])
    assert 0 < partial < 0.9
    # fragmentation penalty: scrambled order scores lower than in-order
    in_order = meteor_sentence("a b c d", ["a b c d"])
    scrambled = meteor_sentence("d c b a", ["a b c d"])
    assert scrambled < in_order
    m = Meteor()
    mean, arr = m.compute_score({"0": ["a b"], "1": ["c d"]},
                                {"0": ["a b"], "1": ["x y"]})
    assert arr.shape == (2,) and arr[0] > arr[1]


class _FakeMeteorJar:
    """Stands in for the meteor-1.5.jar -stdio process: answers each
    'SCORE ||| refs... ||| hyp' line with a stat line, then answers the
    'EVAL ||| stats...' line with one score per segment followed by the
    aggregate (the reference wrapper's protocol,
    test/dvc/metrics/meteor.py:38-82)."""

    def __init__(self):
        self.stdin = self
        self.stdout = self
        self._pending_stats = []
        self._out_lines = []
        self.score_lines = []

    def write(self, data: bytes):
        line = data.decode().rstrip("\n")
        if line.startswith("SCORE ||| "):
            self.score_lines.append(line)
            parts = line.split(" ||| ")
            hyp, refs = parts[-1], parts[1:-1]
            # deterministic fake stat: fraction of hyp words in any ref
            ref_words = set(w for r in refs for w in r.split())
            hits = sum(w in ref_words for w in hyp.split())
            self._pending_stats.append(f"{hits} {len(hyp.split())}")
            self._out_lines.append(self._pending_stats[-1] + "\n")
        elif line.startswith("EVAL ||| "):
            stats = line[len("EVAL ||| "):].split(" ||| ")
            assert stats == self._pending_stats, "EVAL must echo stats in order"
            scores = [int(s.split()[0]) / max(int(s.split()[1]), 1)
                      for s in stats]
            for s in scores:
                self._out_lines.append(f"{s}\n")
            self._out_lines.append(f"{sum(scores) / len(scores)}\n")
        else:  # pragma: no cover
            raise AssertionError(f"protocol violation: {line!r}")

    def flush(self):
        pass

    def readline(self):
        return self._out_lines.pop(0).encode()


def test_java_meteor_subprocess_protocol():
    """JavaMeteor drives the jar's -stdio protocol exactly (mocked process
    — no JRE here; with a real jar the numbers are jar-identical by
    construction since the wrapper only relays lines)."""
    from aha_tpu.eval.captioning import JavaMeteor

    fake = _FakeMeteorJar()
    m = JavaMeteor(popen=fake)
    gts = {"b": ["the dog runs", "a dog runs"], "a": ["hello world"]}
    res = {"b": ["the dog runs"], "a": ["hello there"]}
    final, arr = m.compute_score(gts, res)
    # ids processed in sorted order: 'a' then 'b'
    assert fake.score_lines == [
        "SCORE ||| hello world ||| hello there",
        "SCORE ||| the dog runs ||| a dog runs ||| the dog runs",
    ]
    np.testing.assert_allclose(arr, [0.5, 1.0])
    np.testing.assert_allclose(final, 0.75)
    # ||| stripped from hypotheses before the protocol line (ref :74)
    fake2 = _FakeMeteorJar()
    JavaMeteor(popen=fake2).compute_score(
        {"x": ["a b"]}, {"x": ["a ||| b"]})
    assert "|||" not in fake2.score_lines[0].split(" ||| ")[-1]


def test_build_meteor_fallback(monkeypatch):
    """Backend factory: lite by default here (no JRE/jar), explicit java
    mode errors with guidance, explicit lite always works."""
    from aha_tpu.eval import captioning

    monkeypatch.delenv("AHA_METEOR", raising=False)
    monkeypatch.delenv("AHA_METEOR_JAR", raising=False)
    assert captioning.build_meteor().backend == "lite"
    monkeypatch.setenv("AHA_METEOR", "lite")
    assert captioning.build_meteor().backend == "lite"
    monkeypatch.setenv("AHA_METEOR", "java")
    monkeypatch.setenv("AHA_METEOR_JAR", "/nonexistent/meteor-1.5.jar")
    with pytest.raises(RuntimeError, match="AHA_METEOR=java"):
        captioning.build_meteor()


def test_ptb_tokenizer():
    assert ptb_tokenize_sentence("The man, quickly... ran!") == "the man quickly ran"
    assert ptb_tokenize_sentence("it's 50% off.") == "it's 50 % off"
    out = PTBTokenizer().tokenize({"k": [{"caption": "Hello, World."}]})
    assert out == {"k": ["hello world"]}


# ---------------------------------------------------------------------------
# SODA DP vs reference
# ---------------------------------------------------------------------------


def _ref_dvc(reference_root):
    """Load chased_dp_assignment + iou from the reference without its
    package-relative metric imports."""
    src = (reference_root / "test/dvc/eval_dvc.py").read_text()
    src = src.replace("from .metrics.cider import Cider", "")
    src = src.replace("from .metrics.meteor import Meteor", "")
    src = src.replace("from .metrics.ptbtokenizer import PTBTokenizer", "")
    ns = {}
    exec(compile(src, "ref_eval_dvc", "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref_dvc(reference_root):
    return _ref_dvc(reference_root)


def test_chased_dp_matches_reference(ref_dvc):
    for _ in range(10):
        m, n = int(rng.integers(2, 8)), int(rng.integers(2, 8))
        scores = rng.random((m, n))
        got_score, got_pairs = soda.chased_dp_assignment(scores)
        want_score, want_pairs = ref_dvc["chased_dp_assignment"](scores)
        assert got_score == pytest.approx(want_score)
        assert got_pairs == [(int(a), int(b)) for a, b in want_pairs]


def test_soda_iou_matches_reference(ref_dvc):
    for _ in range(20):
        a = sorted(rng.random(2) * 10)
        b = sorted(rng.random(2) * 10)
        assert soda.iou(a, b) == pytest.approx(ref_dvc["iou"](a, b))


def test_evaluate_detections_matches_reference(ref_dvc):
    pred = np.sort(rng.random((4, 2)) * 10, axis=1)
    gt = np.sort(rng.random((5, 2)) * 10, axis=1)
    splits = np.asarray([1, 1, 1, 2, 2])
    got_p, got_r, got_m = soda.evaluate_detections(pred, gt, splits)
    want_p, want_r, want_m = ref_dvc["evaluate_detections"](pred, gt, splits)
    np.testing.assert_allclose(got_p, want_p)
    np.testing.assert_allclose(got_r, want_r)
    for k in got_m:
        np.testing.assert_allclose(got_m[k], want_m[k])


def test_eval_with_files_runs(tmp_path):
    gt = {"annotations": [
        {"image_id": "vid1", "segments": [[0, 5], [5, 10]],
         "pure_cap": "a man cooks pasta. he serves the dish"},
    ]}
    pred = {"vid1": [
        {"timestamp": [0, 5], "caption": "a man cooks pasta."},
        {"timestamp": [6, 9], "caption": "he serves food."},
    ]}
    gt_path, pred_path = tmp_path / "val.json", tmp_path / "pred.json"
    gt_path.write_text(__import__("json").dumps(gt))
    pred_path.write_text(__import__("json").dumps(pred))
    metrics = soda.eval_with_files(str(pred_path), str(gt_path))
    assert {"CIDER", "METEOR", "SODA_c", "F1_Score", "Para_CIDER"} <= set(metrics)
    assert metrics["SODA_c"] > 0
    assert metrics["Precision@0.3"] > 0


# ---------------------------------------------------------------------------
# QVH
# ---------------------------------------------------------------------------


def test_qvh_interpolated_pr():
    ap = qvh.interpolated_precision_recall(np.asarray([1.0, 0.5, 0.67]),
                                           np.asarray([0.33, 0.33, 0.67]))
    assert 0 < ap <= 1


def test_qvh_detection_ap_perfect():
    gt = [{"video-id": "q", "t-start": 0, "t-end": 10}]
    pred = [{"video-id": "q", "t-start": 0, "t-end": 10, "score": 1.0}]
    ap = qvh.average_precision_detection(gt, pred)
    np.testing.assert_allclose(ap, np.ones(10))


def test_qvh_eval_submission():
    submission, ground_truth = [], []
    for q in range(4):
        start = float(rng.integers(0, 50))
        gt_w = [start, start + 10]
        noise = float(rng.normal() * 2)
        submission.append({
            "qid": q,
            "pred_relevant_windows": [[gt_w[0] + noise, gt_w[1] + noise, 0.9],
                                      [0.0, 2.0, 0.1]],
            "pred_saliency_scores": list(rng.random(75)),
        })
        ground_truth.append({
            "qid": q, "duration": 150, "relevant_windows": [gt_w],
            "relevant_clip_ids": [int(gt_w[0] // 2)],
            "saliency_scores": [[4, 3, 4]],
        })
    out = qvh.eval_submission(submission, ground_truth)
    assert "brief" in out
    assert "MR-full-mAP" in out["brief"]
    assert "HL-min-VeryGood-mAP" in out["brief"]
    assert 0 <= out["brief"]["MR-full-mAP"] <= 100


def test_find_continuous_positive_segments():
    segs = qvh.find_continuous_positive_segments(
        [0, 1, 1, 1, 0, 1, 0, 1, 1], min_relevance_frames=2)
    assert [(s, e) for s, e, _ in segs] == [(1, 3), (7, 8)]
    assert segs[0][2] == pytest.approx(1.0)


def test_submission_from_debug_data():
    dd = [dict(time=float(t), informative_score=0.0,
               relevance_score=1.0 if 4 <= t <= 12 else 0.0,
               uncertainty_score=0.0) for t in range(30)]
    subs = qvh.submission_from_debug_data(
        [{"question_id": 7, "debug_data": dd}],
        alpha=0.0, beta=1.0, epsilon=0.0, uncertainty_threshold=1.0,
        relevance_threshold=0.5, min_relevance_frames=3,
    )
    assert subs[0]["qid"] == 7
    w = subs[0]["pred_relevant_windows"][0]
    assert w[0] == 4.0 and w[1] == 12.0 and w[2] == pytest.approx(1.0)
    assert len(subs[0]["pred_saliency_scores"]) == 14  # 29s / 2s clips

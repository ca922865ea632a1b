"""Eval/calibration stack tests.

Strategy: cross-check against scipy/sklearn (the reference's own backends)
on random score traces, and against the reference's metric functions run
directly from `/root/reference` where they are importable without torch.
"""

import importlib.util
import sys

import numpy as np
import pytest

from aha_tpu.eval import grid_search, grounding, highlight, hisum, tvsum
from aha_tpu.eval.scoring import (
    average_precision,
    combined_score,
    keep_longest_true_span,
    mask_iou,
    normalize_pred_list,
    qvh_to_charades_format,
    smooth_pred_list,
    span_iou,
    times_in_spans,
)
from aha_tpu.ops import signal


def _load_ref_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_tvsum(reference_root):
    return _load_ref_module(reference_root / "test/tvsum/tvsum_utils.py", "ref_tvsum")


@pytest.fixture(scope="module")
def ref_hisum(reference_root):
    return _load_ref_module(reference_root / "test/hisum/hisum_eval.py", "ref_hisum")


rng = np.random.default_rng(0)


# ---------------------------------------------------------------------------
# scoring primitives
# ---------------------------------------------------------------------------


def test_average_precision_matches_sklearn():
    from sklearn.metrics import average_precision_score

    for _ in range(20):
        n = rng.integers(5, 60)
        labels = rng.integers(0, 2, n)
        if labels.sum() == 0:
            labels[0] = 1
        scores = rng.normal(size=n)
        np.testing.assert_allclose(
            average_precision(labels, scores), average_precision_score(labels, scores),
            rtol=1e-10,
        )


def test_smooth_pred_list_matches_reference_formula():
    x = rng.normal(size=30)
    for w in (0, 1, 4, 10):
        want = [np.mean(x[max(0, i - w): min(len(x), i + w + 1)]) for i in range(len(x))]
        got = smooth_pred_list(x, w)
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_normalize_and_masks():
    x = np.asarray([1.0, 3.0, 2.0])
    np.testing.assert_allclose(normalize_pred_list(x), [0.0, 1.0, 0.5])
    m, ln = keep_longest_true_span([True, False, True, True, True, False, True])
    assert ln == 3 and list(m) == [False, False, True, True, True, False, False]
    assert mask_iou([1, 1, 0], [0, 1, 1]) == pytest.approx(1 / 3)
    assert span_iou((0, 4), (2, 6)) == pytest.approx(3 / 7)
    assert list(times_in_spans([0.5, 2.5, 9.0], [(0, 1), (2, 3)])) == [True, True, False]


def test_combined_score_combo_axis():
    info, rel, unc = rng.random(10), rng.random(10), rng.random(10)
    A = np.asarray([0.0, 1.0])
    B = np.asarray([1.0, 0.5])
    E = np.asarray([2.0, -1.0])
    T = np.asarray([0.1, 0.5])
    batch = combined_score(info, rel, unc, A, B, E, T)
    for c in range(2):
        single = combined_score(info, rel, unc, A[c], B[c], E[c], T[c])
        np.testing.assert_allclose(batch[c], single)
        want = A[c] * info + B[c] * rel - E[c] * np.maximum(unc - T[c], 0)
        np.testing.assert_allclose(single, want)


def test_qvh_conversion():
    ex = {
        "answer": {
            "saliency_scores": [[4, 4], [4, 3], [2, 1], [4, 4]],
            "relevant_clip_ids": [0, 1, 3, 5],
        }
    }
    out = qvh_to_charades_format(ex)
    assert out["timestamps"] == [[6, 6], [5 * 2, 5 * 2 + 2]]


# ---------------------------------------------------------------------------
# tvsum
# ---------------------------------------------------------------------------


def test_tvsum_metrics_match_reference(ref_tvsum):
    gt_dict, pred_dict = {}, {}
    for v in range(6):
        n = int(rng.integers(20, 80))
        gt_dict[f"v{v}"] = rng.random(n)
        pred_dict[f"v{v}"] = rng.random(n)
    want = ref_tvsum.evaluate_tvsum(gt_dict, pred_dict)
    got = tvsum.evaluate_tvsum(gt_dict, pred_dict)
    np.testing.assert_allclose(
        [got["mAP50"], got["mAP15"], got["top5_mAP"], got["spearman"], got["kendall"]],
        want, rtol=1e-9,
    )
    np.testing.assert_allclose(got["f1@15"], ref_tvsum.evaluate_f1(gt_dict, pred_dict), rtol=1e-9)


def test_top_k_ap_vectorized_matches_scalar(ref_tvsum):
    gt = rng.integers(0, 2, 40)
    preds = rng.random((7, 40))
    batch = tvsum.top_k_ap(gt, preds, k=5)
    for c in range(7):
        want = ref_tvsum.compute_ap(gt, np.argsort(preds[c])[::-1], k=5)
        np.testing.assert_allclose(batch[c], want, rtol=1e-9)


def test_load_annotations(tmp_path):
    tsv = tmp_path / "anno.tsv"
    tsv.write_text("vid1\tGA\t5,5,5\nvid1\tGA\t1,3,5\nvid2\tXX\t2,2,2\n")
    annos = tvsum.load_annotations(str(tsv))
    np.testing.assert_allclose(annos["vid1"]["importance_scores"], [0.6, 0.8, 1.0])
    np.testing.assert_allclose(annos["vid2"]["importance_scores"], [0.4, 0.4, 0.4])
    assert annos["vid1"]["category_code"] == "GA"


# ---------------------------------------------------------------------------
# hisum
# ---------------------------------------------------------------------------


def test_hisum_matches_reference(ref_hisum):
    gt_dict, pred_dict = {}, {}
    for v in range(5):
        n = int(rng.integers(30, 90))
        gt_dict[f"v{v}"] = rng.random(n)
        pred_dict[f"v{v}"] = rng.random(n)
    want = ref_hisum.hisum_evaluate_scores(gt_dict, pred_dict, spearman_kendall=True,
                                           print_logs=False)
    got = hisum.evaluate_scores(gt_dict, pred_dict, spearman_kendall=True)
    np.testing.assert_allclose(got["mAP@50"], want["mAP@50"], rtol=1e-9)
    np.testing.assert_allclose(got["mAP@15"], want["mAP@15"], rtol=1e-9)
    np.testing.assert_allclose(got["f1"], want["f1"], rtol=1e-9)
    np.testing.assert_allclose(got["spearman"], want["spearman"], rtol=1e-9)
    np.testing.assert_allclose(got["kendall"], want["kendall"], rtol=1e-9)


# ---------------------------------------------------------------------------
# grounding + grid search
# ---------------------------------------------------------------------------


def _fake_predictions(n_videos=4, n_frames=50):
    preds, golds = [], {}
    for v in range(n_videos):
        qid = f"q{v}"
        dd = [
            dict(
                time=float(t),
                informative_score=float(rng.random()),
                relevance_score=float(rng.random()),
                uncertainty_score=float(rng.random() * 0.2),
            )
            for t in range(n_frames)
        ]
        preds.append({"question_id": qid, "debug_data": dd})
        s = int(rng.integers(0, n_frames - 10))
        golds[qid] = {"question_id": qid, "timestamps": [[s, s + 8]]}
    return preds, golds


def test_grounding_sweep_shapes():
    preds, golds = _fake_predictions()
    out = grounding.evaluate_grounding(preds, golds, 0.5, 1.0, 0.0, 0.1,
                                       smooth_windows=range(0, 3))
    assert len(out["rows"]) == 3 * len(grounding.THRESHOLDS)
    assert set(out["best_among_thresholds"]) == {0, 1, 2}
    for row in out["rows"]:
        assert 0 <= row["R@0.5"] <= 100


def test_grid_score_r05_matches_loop():
    preds, golds = _fake_predictions()
    A = np.asarray([0.0, 1.0, 0.5])
    B = np.asarray([1.0, 0.0, 0.5])
    E = np.asarray([0.0, 2.0, -1.0])
    T = np.asarray([0.05, 0.1, 0.15])
    batch = grounding.grid_score_r05(preds, golds, A, B, E, T)
    for c in range(3):
        ious = []
        for p in preds:
            iou_per_thr = grounding.per_video_ious(
                p["debug_data"], golds[p["question_id"]]["timestamps"],
                A[c], B[c], E[c], T[c],
            )
            ious.append(iou_per_thr.max())
        want = np.mean(np.asarray(ious) >= 0.5) * 100
        np.testing.assert_allclose(batch[c], want)


def test_grid_search_tvsum_runs(tmp_path):
    preds = []
    ground_truths = {}
    for v in range(6):
        n = 40
        vid = f"v{v}"
        gt = rng.random(200)
        ground_truths[vid] = {"importance_scores": gt.tolist(), "category_code": "GA",
                              "video_uid": vid}
        dd = [
            dict(time=float(t), informative_score=float(rng.random()),
                 relevance_score=float(rng.random()),
                 uncertainty_score=float(rng.random() * 0.2))
            for t in range(n)
        ]
        preds.append({"video_uuid": vid, "debug_data": dd,
                      "true_frames_list": list(range(0, 200, 5))})
    save = tmp_path / "params.json"
    small_grid = {
        "alpha": np.linspace(0, 1.5, 3),
        "beta": np.linspace(0, 1.5, 3),
        "epsilon": np.linspace(-5, 5, 3),
        "uncertainty_threshold": np.linspace(0.04, 0.15, 3),
    }
    best = grid_search.run_grid_search(
        "tvsum", preds, ground_truths=ground_truths, grid=small_grid,
        save_path=str(save), seed=0,
    )
    assert {"alpha", "beta", "epsilon", "uncertainty_threshold", "best_score",
            "test_top5_map"} <= set(best)
    import json

    assert "tvsum" in json.loads(save.read_text())


# ---------------------------------------------------------------------------
# highlight knapsack
# ---------------------------------------------------------------------------


def test_knapsack_matches_reference_dp():
    values = rng.random(30)
    budget = 10
    got = highlight.knapsack_selection(values, budget)

    # reference DP re-derivation (pure python, highlight_generator.py:8-37)
    n = len(values)
    dp = [[0.0] * (budget + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        v = values[i - 1]
        for j in range(budget + 1):
            dp[i][j] = max(dp[i - 1][j], dp[i - 1][j - 1] + v) if j >= 1 else dp[i - 1][j]
    want, j = set(), budget
    for i in range(n, 0, -1):
        if dp[i][j] != dp[i - 1][j]:
            want.add(i - 1)
            j -= 1
    assert got == want
    assert len(got) <= budget


def test_expand_selection():
    out = highlight.expand_selection({0, 2}, [10, 20, 30], source_fps=4.0, last_frame=35)
    assert out == [8, 9, 10, 11, 12, 28, 29, 30, 31, 32]


# ---------------------------------------------------------------------------
# signal ops vs scipy
# ---------------------------------------------------------------------------


def test_savgol_matches_scipy():
    from scipy.signal import savgol_filter as scipy_savgol

    for n in (15, 40, 200):
        x = rng.normal(size=n).cumsum()
        got = signal.savgol_filter(x, 15, 3)
        want = scipy_savgol(x, 15, 3)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_find_peaks_matches_scipy():
    from scipy.signal import find_peaks as scipy_find_peaks

    for trial in range(10):
        x = np.convolve(rng.normal(size=120), np.ones(5) / 5, mode="same")
        for kwargs in (
            {},
            {"height": 0.1},
            {"prominence": 0.2},
            {"distance": 7},
            {"height": 0.0, "prominence": 0.1, "distance": 10},
        ):
            got = signal.find_peaks(x, **kwargs)
            want, _ = scipy_find_peaks(x, **kwargs)
            np.testing.assert_array_equal(got, want)


def test_find_ticks_matches_reference_recipe():
    from scipy.signal import find_peaks as scipy_find_peaks
    from scipy.signal import savgol_filter as scipy_savgol

    scores = np.abs(np.convolve(rng.normal(size=300), np.ones(9) / 9, mode="same"))
    fps = 2.0
    got = signal.find_ticks(scores, fps)
    smoothed = scipy_savgol(scores, 15, 3)
    thresh = smoothed.mean() + 0.5 * smoothed.std()
    want, _ = scipy_find_peaks(smoothed, height=thresh, prominence=0.02,
                               distance=int(10 * fps))
    np.testing.assert_allclose(got, list(want / fps))


def test_savgol_jnp_matches_host():
    import jax.numpy as jnp

    from scipy.signal import savgol_filter as scipy_savgol

    x = rng.normal(size=(3, 60)).cumsum(axis=-1)
    got = np.asarray(signal.savgol_filter_jnp(jnp.asarray(x), 15, 3))
    want = scipy_savgol(x, 15, 3, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

"""Mr.HiSum summarization metrics.

Semantics re-derived from `/root/reference/test/hisum/hisum_eval.py`:
fixed-length shot segmentation (:9-14), shot-level mAP at binarization
ratio rho (:19-35), greedy budget-constrained F1 at 15% (:37-76), and the
aggregate entry (:79-134). Vectorized over an optional leading combo axis.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import kendalltau, spearmanr

from aha_tpu.eval.scoring import average_precision


def segment_into_shots(scores: np.ndarray, shot_length: int = 1, fps: int = 1):
    """Mean score per fixed-length shot. scores: [..., T] -> [..., n_seg]."""
    scores = np.asarray(scores, np.float64)
    seg = shot_length * fps
    n = scores.shape[-1]
    n_seg = -(-n // seg)
    pad = n_seg * seg - n
    if pad:
        # mean of a ragged tail == mean of the valid entries only
        padded = np.concatenate(
            [scores, np.full(scores.shape[:-1] + (pad,), np.nan)], axis=-1
        )
    else:
        padded = scores
    shaped = padded.reshape(*scores.shape[:-1], n_seg, seg)
    return np.nanmean(shaped, axis=-1), n_seg, seg


def map_at_rho(gt_scores: np.ndarray, pred_scores: np.ndarray, rho: float) -> np.ndarray:
    """Shot-level AP; pred may be [C, T]."""
    gt_seg, n_seg, _ = segment_into_shots(np.asarray(gt_scores, np.float64))
    pred_seg, _, _ = segment_into_shots(np.asarray(pred_scores, np.float64))
    k = max(1, int(rho * n_seg))
    labels = np.zeros(n_seg, np.int64)
    labels[np.argsort(gt_seg)[-k:]] = 1
    if pred_seg.ndim == 2:
        labels = np.broadcast_to(labels, pred_seg.shape)
    return average_precision(labels, pred_seg)


def mean_average_precision(gt_dict: dict, pred_dict: dict, rho: float = 0.5) -> np.ndarray:
    aps = [map_at_rho(gt_dict[v], pred_dict[v], rho) for v in gt_dict]
    aps = np.stack(aps)
    # ref skips nan APs per video (hisum_eval.py:32-33)
    with np.errstate(invalid="ignore"):
        return np.nanmean(aps, axis=0)


def f1_budget(gt_scores: np.ndarray, pred_scores: np.ndarray, budget: float = 0.15,
              shot_length: int = 1) -> float:
    """Greedy top-shot selection under a frame budget vs top-percentile GT
    (ref hisum_f1_score_summarization). Per-video float (not combo-vectorized
    — the greedy break makes it inherently sequential)."""
    gt = np.asarray(gt_scores, np.float64)
    pred = np.asarray(pred_scores, np.float64)
    n = gt.shape[0]
    boundaries = [(i, min(i + shot_length, n)) for i in range(0, n, shot_length)]
    shot_scores = np.asarray([pred[s:e].mean() for s, e in boundaries])
    total_budget = int(budget * n)
    selected = np.zeros(n, bool)
    acc = 0
    for idx in np.argsort(shot_scores)[::-1]:
        s, e = boundaries[idx]
        if acc + (e - s) <= total_budget:
            selected[s:e] = True
            acc += e - s
        if acc >= total_budget:
            break
    gt_selected = gt >= np.percentile(gt, 100 * (1 - budget))
    tp = (selected & gt_selected).sum()
    denom = 2 * tp + (selected & ~gt_selected).sum() + (~selected & gt_selected).sum()
    f1 = 0.0 if denom == 0 else 2 * tp / denom
    return round(float(f1), 2)  # ref rounds per-video to 2 decimals


def evaluate_scores(gt_dict: dict, pred_dict: dict, spearman_kendall: bool = False) -> dict:
    out = {
        "mAP@50": float(mean_average_precision(gt_dict, pred_dict, 0.5)),
        "mAP@15": float(mean_average_precision(gt_dict, pred_dict, 0.15)),
        "f1": float(np.mean([f1_budget(gt_dict[v], pred_dict[v]) for v in gt_dict])),
    }
    if spearman_kendall:
        sp, kd = [], []
        for v in gt_dict:
            gt, pred = np.asarray(gt_dict[v]), np.asarray(pred_dict[v])
            if len(gt) != len(pred):
                continue
            if len(gt) > 1:
                sp.append(spearmanr(gt, pred).statistic)
                kd.append(kendalltau(gt, pred).statistic)
            else:
                sp.append(0.0)
                kd.append(0.0)
        out["spearman"] = float(np.mean(sp))
        out["kendall"] = float(np.mean(kd))
    return out

"""Prediction-vs-ground-truth score visualization.

Re-derivation of `/root/reference/test/visualize.py`: per-video overlay of
the calibrated combined score against GT importance curves for TVSum /
Mr.HiSum, driven by the driver output JSON + grid-search params.
"""

from __future__ import annotations

import json
import os

import numpy as np

from aha_tpu.eval.scoring import combined_score, normalize_pred_list, traces_from_debug_data


def _calibrated_scores(prediction: dict, params: dict) -> np.ndarray:
    tr = traces_from_debug_data(prediction["debug_data"])
    return combined_score(
        tr["informative"], tr["relevance"], tr["uncertainty"],
        params["alpha"], params["beta"], params["epsilon"],
        params["uncertainty_threshold"],
    )


def plot_pred_vs_gt(
    prediction: dict,
    gt_scores: np.ndarray,
    params: dict,
    out_path: str,
    *,
    title: str | None = None,
    extra_curves: dict[str, np.ndarray] | None = None,
):
    """One video: normalized prediction vs GT curve (+ optional SOTA
    comparison curves, ref visualize.py SOTA overlays)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pred = normalize_pred_list(_calibrated_scores(prediction, params))
    gt = np.asarray(gt_scores, np.float64)
    n = min(len(pred), len(gt))
    fig, ax = plt.subplots(figsize=(10, 3))
    ax.plot(np.arange(n), gt[:n] / (gt[:n].max() or 1.0), label="ground truth",
            color="tab:green", lw=1)
    ax.plot(np.arange(n), pred[:n], label="prediction", color="tab:blue", lw=1)
    for name, curve in (extra_curves or {}).items():
        c = np.asarray(curve, np.float64)[:n]
        ax.plot(np.arange(n), c / (c.max() or 1.0), label=name, lw=1, alpha=0.7)
    ax.set_xlabel("frame")
    ax.set_ylabel("normalized score")
    ax.set_title(title or prediction.get("video_uuid", ""))
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def visualize_benchmark(
    pred_file: str,
    params_file: str,
    params_key: str,
    gt_lookup,              # video_uuid -> gt score array
    output_dir: str,
    *,
    max_videos: int | None = None,
) -> list[str]:
    """Batch plotting for a driver output JSON."""
    with open(pred_file) as f:
        preds = json.load(f)
    with open(params_file) as f:
        params = json.load(f)[params_key]
    os.makedirs(output_dir, exist_ok=True)
    out = []
    for p in preds[:max_videos]:
        gt = gt_lookup(p["video_uuid"])
        if gt is None:
            continue
        path = os.path.join(output_dir, f"{p['video_uuid']}.png")
        out.append(plot_pred_vs_gt(p, gt, params, path))
    return out

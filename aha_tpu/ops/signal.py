"""Signal processing for score traces: Savitzky-Golay smoothing and peak
detection — both as host numpy (scipy-parity) and as jit-compatible jnp ops
so the per-frame decision loop can stay on device.

The reference uses scipy directly (`savgol_filter(window 15, order 3)` +
`find_peaks(height=mean+0.5*std, prominence=.02, distance=10s*fps)`,
`/root/reference/test/live_video/infer_live_video.py:70-91`); here the
SavGol kernel is a closed-form least-squares projection (a fixed 1-D
convolution — MXU/VPU friendly) and peak finding is a vectorized
plateau-aware comparison.
"""

from __future__ import annotations

import numpy as np

try:  # optional at import time: host-side helpers work without jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def savgol_coeffs(window_length: int, polyorder: int) -> np.ndarray:
    """Least-squares smoothing kernel: row 0 of (AᵀA)⁻¹Aᵀ for the centered
    Vandermonde A[i, j] = x_i^j, x ∈ [-h, h]."""
    if window_length % 2 != 1:
        raise ValueError("window_length must be odd")
    if polyorder >= window_length:
        raise ValueError("polyorder must be < window_length")
    h = window_length // 2
    x = np.arange(-h, h + 1, dtype=np.float64)
    A = np.vander(x, polyorder + 1, increasing=True)         # [W, p+1]
    # projection of the unit impulse onto the poly fit, evaluated at 0
    coeffs = np.linalg.pinv(A)[0]                             # value at x=0
    return coeffs


def savgol_filter(x: np.ndarray, window_length: int = 15, polyorder: int = 3) -> np.ndarray:
    """scipy-compatible 'interp' edge mode: interior points are the fixed
    convolution; the first/last h points come from polynomials fitted to the
    first/last window."""
    x = np.asarray(x, np.float64)
    n = x.shape[-1]
    if n < window_length:
        # degenerate: single global polyfit (matches scipy when window > n? no
        # — scipy raises; we fit what we have to stay robust on short traces)
        deg = min(polyorder, n - 1)
        t = np.arange(n)
        return np.polyval(np.polyfit(t, x, deg), t)
    h = window_length // 2
    kernel = savgol_coeffs(window_length, polyorder)
    mid = np.convolve(x, kernel[::-1], mode="valid")          # [n - 2h]
    t = np.arange(window_length)
    head_poly = np.polyfit(t, x[:window_length], polyorder)
    tail_poly = np.polyfit(t, x[-window_length:], polyorder)
    head = np.polyval(head_poly, t[:h])
    tail = np.polyval(tail_poly, t[h + 1:])
    return np.concatenate([head, mid, tail])


def savgol_filter_jnp(x, window_length: int = 15, polyorder: int = 3):
    """Device-side SavGol over the last axis of [..., T]: the interior is a
    fixed 1-D convolution, the edges are small fit-evaluate matmuls —
    everything jit/vmap-friendly so smoothing can live in the on-device
    decision loop (SURVEY §7 'on-device decision + smoothing')."""
    kernel = jnp.asarray(savgol_coeffs(window_length, polyorder), x.dtype)
    h = window_length // 2
    lead = x.shape[:-1]
    T = x.shape[-1]
    flat = x.reshape(-1, T)
    # interior: valid convolution via sliding windows matmul
    idx = jnp.arange(T - 2 * h)[:, None] + jnp.arange(window_length)[None, :]
    windows = flat[:, idx]                                   # [N, T-2h, W]
    mid = jnp.einsum("ntw,w->nt", windows, kernel)
    # edge projections: head = P_head @ x[:W], tail = P_tail @ x[-W:]
    t = np.arange(window_length, dtype=np.float64)
    A = np.vander(t, polyorder + 1, increasing=True)
    proj = A @ np.linalg.pinv(A)                              # [W, W] fit-evaluate
    P_head = jnp.asarray(proj[:h], x.dtype)
    P_tail = jnp.asarray(proj[h + 1:], x.dtype)
    head = jnp.einsum("hw,nw->nh", P_head, flat[:, :window_length])
    tail = jnp.einsum("hw,nw->nh", P_tail, flat[:, -window_length:])
    out = jnp.concatenate([head, mid, tail], axis=-1)
    return out.reshape(*lead, T)


def find_peaks(
    x: np.ndarray,
    height: float | None = None,
    prominence: float | None = None,
    distance: int | None = None,
) -> np.ndarray:
    """Local-maxima peak detection with the scipy semantics subset the
    reference uses (height / prominence / distance), including plateau
    handling (scipy reports the middle of a flat peak) and scipy's ordering:
    distance pruning keeps higher peaks first, prominence computed against
    the lower of the two flanking minima within the nearest higher-peak
    window."""
    x = np.asarray(x, np.float64)
    n = x.shape[0]
    peaks: list[int] = []
    i = 1
    while i < n - 1:
        if x[i - 1] < x[i]:
            # possible peak or plateau start
            j = i
            while j < n - 1 and x[j + 1] == x[i]:
                j += 1
            if j < n - 1 and x[j + 1] < x[i]:
                peaks.append((i + j) // 2)
            i = j + 1
        else:
            i += 1
    peaks_arr = np.asarray(peaks, np.int64)

    # scipy filter order: height -> distance -> prominence
    if height is not None and peaks_arr.size:
        peaks_arr = peaks_arr[x[peaks_arr] >= height]

    if distance is not None and distance > 1 and peaks_arr.size:
        keep = np.ones(peaks_arr.size, bool)
        # highest first; ties: later peak wins (scipy iterates argsort reversed)
        order = np.argsort(x[peaks_arr], kind="stable")[::-1]
        for k in order:
            if not keep[k]:
                continue
            too_close = np.abs(peaks_arr - peaks_arr[k]) < distance
            too_close[k] = False
            keep[too_close] = False
        peaks_arr = peaks_arr[keep]

    if prominence is not None and peaks_arr.size:
        keep = _prominences(x, peaks_arr) >= prominence
        peaks_arr = peaks_arr[keep]

    return peaks_arr


def _prominences(x: np.ndarray, peaks: np.ndarray) -> np.ndarray:
    out = np.empty(peaks.size)
    for idx, p in enumerate(peaks):
        left_min = x[p]
        i = p - 1
        while i >= 0 and x[i] <= x[p]:
            left_min = min(left_min, x[i])
            i -= 1
        right_min = x[p]
        i = p + 1
        while i < x.size and x[i] <= x[p]:
            right_min = min(right_min, x[i])
            i += 1
        out[idx] = x[p] - max(left_min, right_min)
    return out


def find_ticks(
    scores: np.ndarray,
    fps: float,
    min_separation: float = 10.0,
    prominence: float = 0.02,
    thresh: float | None = None,
) -> list[float]:
    """Highlight tick times (ref find_ticks, infer_live_video.py:70-91):
    savgol(15, 3) → threshold mean+0.5σ → peaks with prominence and 10 s
    min separation → times in seconds."""
    scores = np.asarray(scores, np.float64)
    smoothed = savgol_filter(scores, 15, 3)
    if thresh is None:
        thresh = float(smoothed.mean() + 0.5 * smoothed.std())
    distance = int(min_separation * fps)
    peaks = find_peaks(smoothed, height=thresh, prominence=prominence, distance=max(distance, 1))
    return list(np.sort(peaks) / fps)

"""Host-side media utilities: decode, letterbox, corruption simulation,
metadata scanning, fps time quantizers.

Semantics re-derived from `/root/reference/data/utils.py` (resize/pad
:162-185, dropout :33-53, quantizers :153-160), `/root/reference/data/
stream.py:147-167` (fps-resampled sequential decode) and
`/root/reference/utils/video_loader.py:44-58` (parallel metadata scan).

cv2 is imported lazily so pure-array users (tests, TPU-only hosts) never
touch it; the C++ libav decoder (aha_tpu/native) is the fast path and this
is the portable fallback.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np


def round_time_by_fps(time: float, fps: float, min_time: float, max_time: float) -> float:
    return min(max(round(time * fps) / fps, min_time), max_time)


def ceil_time_by_fps(time: float, fps: float, min_time: float, max_time: float) -> float:
    return min(max(math.ceil(time * fps) / fps, min_time), max_time)


def floor_time_by_fps(time: float, fps: float, min_time: float, max_time: float) -> float:
    return min(max(math.floor(time * fps) / fps, min_time), max_time)


def resize_and_pad_frame(frame: np.ndarray, output_size: int, pad_color=(0, 0, 0)) -> np.ndarray:
    """Aspect-preserving letterbox to a square canvas (numpy/cv2)."""
    import cv2

    h, w = frame.shape[:2]
    if h == output_size and w == output_size:
        return frame
    if w > h:
        new_w, new_h = output_size, int((h / w) * output_size)
    else:
        new_h, new_w = output_size, int((w / h) * output_size)
    resized = cv2.resize(frame, (new_w, new_h))
    return cv2.copyMakeBorder(
        resized,
        top=(output_size - new_h) // 2,
        bottom=(output_size - new_h + 1) // 2,
        left=(output_size - new_w) // 2,
        right=(output_size - new_w + 1) // 2,
        borderType=cv2.BORDER_CONSTANT,
        value=pad_color,
    )


def letterbox_params(h: int, w: int, output_size: int) -> tuple[int, int, int, int]:
    """(new_h, new_w, top, left) of the letterbox placement — shared with the
    native decoder and the device-side preprocessing kernel."""
    if w > h:
        new_w, new_h = output_size, int((h / w) * output_size)
    else:
        new_h, new_w = output_size, int((w / h) * output_size)
    return new_h, new_w, (output_size - new_h) // 2, (output_size - new_w) // 2


# ---------------------------------------------------------------------------
# Quality-dropout corruption (a paper contribution — first-class feature)
# ---------------------------------------------------------------------------


def dropout_simulation(frame: np.ndarray, w: int, h: int, dropout_type: str = "quality",
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Four degradation modes (ref dropout_simultion, data/utils.py:33-53)."""
    import cv2

    rng = rng or np.random.default_rng()
    if dropout_type == "quality":
        degraded = cv2.resize(frame, (64, 64), interpolation=cv2.INTER_LINEAR)
        frame = cv2.resize(degraded, (w, h), interpolation=cv2.INTER_NEAREST)
        frame = cv2.GaussianBlur(frame, (5, 5), 0)
    elif dropout_type == "block_noise":
        bs = 32
        noise = rng.integers(0, 50, (bs, bs, 3), dtype=np.uint8)
        frame = frame.copy()
        for y in range(0, frame.shape[0], bs):
            for x in range(0, frame.shape[1], bs):
                if rng.random() < 0.1:
                    bh = min(bs, frame.shape[0] - y)
                    bw = min(bs, frame.shape[1] - x)
                    frame[y : y + bh, x : x + bw] = noise[:bh, :bw]
    elif dropout_type == "color_banding":
        frame = (frame // 64) * 64
    elif dropout_type == "blackout":
        frame = np.zeros_like(frame)
    return frame


def generate_dropout_segments(
    duration: float,
    *,
    coverage_range: tuple[float, float] = (0.05, 0.20),
    segment_range: tuple[float, float] = (2.0, 10.0),
    types: tuple[str, ...] = ("quality", "block_noise", "color_banding", "blackout"),
    seed: int | None = None,
    max_tries: int = 1000,
) -> list[tuple[float, float, str]]:
    """Seeded non-overlapping corruption segments covering 5-20% of the video
    (ref get_dropout_segments_with_types, test/live_video/quality_dropout.py:178-287)."""
    rng = np.random.default_rng(seed)
    target = duration * rng.uniform(*coverage_range)
    segments: list[tuple[float, float, str]] = []
    covered = 0.0
    tries = 0
    while covered < target and tries < max_tries:
        tries += 1
        length = min(rng.uniform(*segment_range), target - covered)
        if length <= 0:
            break
        start = rng.uniform(0, max(duration - length, 0))
        end = start + length
        if any(not (end <= s or start >= e) for s, e, _ in segments):
            continue
        segments.append((start, end, str(rng.choice(types))))
        covered += length
    return sorted(segments)


# ---------------------------------------------------------------------------
# Decoding
# ---------------------------------------------------------------------------


def decode_video(
    path: str,
    *,
    output_fps: float,
    output_size: int = 384,
    source_fps: float | None = None,
    duration: float | None = None,
    max_frames: int | None = None,
    dropout_intervals: list | None = None,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, list[int]]:
    """Sequential decode resampled to output_fps with letterboxing.

    Returns (frames [T, S, S, 3] uint8 RGB, true_frame_indices mapping each
    output frame to its source frame index — needed by tvsum alignment and
    highlight reels, ref test/inference.py:497-582).

    dropout_intervals: [(start_s, end_s, type)] applied during decode
    (ref data/HIHD.py:97-130).

    Uses the native libav decoder (aha_tpu/native) when built — identical
    frame selection and letterbox geometry — and falls back to cv2. The
    corruption-simulation path always decodes via cv2 (corruption applies
    to the pre-letterbox frame).
    """
    if dropout_intervals is None:
        try:
            from aha_tpu import native

            if native.available():
                frames, idx = native.decode_video_native(
                    path, output_fps=output_fps, output_size=output_size,
                    max_frames=max_frames,
                )
                return frames, idx
        except Exception:
            pass  # fall through to cv2
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    src_fps = source_fps or cap.get(cv2.CAP_PROP_FPS) or 30.0
    if duration is None:
        n_src = cap.get(cv2.CAP_PROP_FRAME_COUNT)
        duration = n_src / src_fps if n_src > 0 else 0.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))

    num_out = math.floor(duration * output_fps)
    if max_frames is not None:
        num_out = min(num_out, max_frames)
    target_times = [i / output_fps for i in range(num_out)]
    pending = list(dropout_intervals) if dropout_intervals else []

    frames: list[np.ndarray] = []
    true_idx: list[int] = []
    cur_time, out_i, src_i = 0.0, 0, 0
    while out_i < len(target_times):
        ret, frame = cap.read()
        if not ret:
            break
        if cur_time >= target_times[out_i]:
            while pending and cur_time > pending[0][1]:
                pending.pop(0)
            if pending and pending[0][0] <= cur_time <= pending[0][1]:
                frame = dropout_simulation(frame, w, h, pending[0][2], rng)
            frame = resize_and_pad_frame(frame, output_size)
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            true_idx.append(src_i)
            out_i += 1
        cur_time += 1.0 / src_fps
        src_i += 1
    cap.release()
    if not frames:
        return np.zeros((0, output_size, output_size, 3), np.uint8), []
    return np.stack(frames), true_idx


def motion_mask(
    frames: np.ndarray,
    threshold: float,
    *,
    max_skip: int = 8,
) -> np.ndarray:
    """[T, H, W, 3] uint8 -> bool [T]: which frames carry new content.

    A frame is kept when its mean absolute pixel difference from the LAST
    KEPT frame exceeds ``threshold`` (0..1 of full scale, i.e. 0.02 = 5.1
    gray levels), or when ``max_skip`` frames have been held since the
    last kept one (bounds drift on slow pans). Frame 0 is always kept.

    This is the host-side analog of codec-signal frame selection for
    streaming VLMs (see PAPERS.md): static stretches of a live stream
    carry no new evidence, so the scoring loop can hold the previous
    score instead of paying a decoder pass. Beyond-reference, opt-in —
    the reference resamples uniformly (output_fps / 'auto',
    test/inference.py:497-582); skipped frames never enter the KV, which
    is the same semantic class as decoding at a lower fps.
    """
    T = frames.shape[0]
    keep = np.zeros(T, bool)
    if T == 0:
        return keep
    keep[0] = True
    # uint8 -> int16 once; mean |diff| per frame against the running anchor
    anchor = frames[0].astype(np.int16)
    held = 0
    lim = float(threshold) * 255.0
    for t in range(1, T):
        held += 1
        if held >= max_skip:
            keep[t] = True
        else:
            d = np.abs(frames[t].astype(np.int16) - anchor).mean()
            keep[t] = d > lim
        if keep[t]:
            anchor = frames[t].astype(np.int16)
            held = 0
    return keep


def load_frame_folder(
    frame_folder: str,
    *,
    output_size: int = 384,
    output_fps: float = 1.0,
    start: int | None = None,
    end: int | None = None,
    exts=(".jpg", ".jpeg", ".png"),
) -> tuple[np.ndarray, float, float]:
    """Load a directory of frame images (demo path; ref
    load_individual_frames_for_testing, test/inference.py:379-417).
    Returns (frames [T, S, S, 3] RGB, fps, duration)."""
    import cv2

    names = sorted(n for n in os.listdir(frame_folder) if n.lower().endswith(exts))
    names = names[start:end]
    frames = []
    for name in names:
        img = cv2.imread(os.path.join(frame_folder, name))
        if img is None:
            continue
        img = resize_and_pad_frame(img, output_size)
        frames.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    arr = (np.stack(frames) if frames
           else np.zeros((0, output_size, output_size, 3), np.uint8))
    return arr, output_fps, arr.shape[0] / output_fps


def write_video(frames_rgb: np.ndarray, path: str, fps: float) -> int:
    """[T, H, W, 3] RGB uint8 -> mp4 (the reference's tensor-to-mp4 writer,
    test/live_video/quality_dropout.py:153-173). Returns frames written."""
    import cv2

    T, H, W = frames_rgb.shape[:3]
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    for t in range(T):
        writer.write(cv2.cvtColor(frames_rgb[t], cv2.COLOR_RGB2BGR))
    writer.release()
    return T


def reencode_video(src: str, dst: str, *, fps: float | None = None,
                   size: tuple[int, int] | None = None) -> int:
    """Re-encode a video via cv2 (the reference shells out to ffmpeg,
    data/utils.py:97-113; no ffmpeg binary here). Shard across hosts with
    `aha_tpu.utils.dist.shard_iterable`. Returns frames written."""
    import cv2

    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        raise IOError(f"cannot open {src}")
    src_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    out_fps = fps or src_fps
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    out_size = size or (w, h)
    writer = cv2.VideoWriter(dst, cv2.VideoWriter_fourcc(*"mp4v"), out_fps, out_size)
    written = 0
    step = src_fps / out_fps
    next_keep = 0.0
    i = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        if i >= next_keep:
            if out_size != (w, h):
                frame = cv2.resize(frame, out_size)
            writer.write(frame)
            written += 1
            next_keep += step
        i += 1
    cap.release()
    writer.release()
    return written


def probe_video(path: str) -> dict:
    """Single-file metadata probe (fps/duration/validity)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        return {"path": path, "valid": False, "fps": 0.0, "duration": 0.0}
    fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
    n = cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0.0
    ret, _ = cap.read()
    cap.release()
    return {
        "path": path,
        "valid": bool(ret),
        "fps": float(fps),
        "duration": float(n / fps) if fps else 0.0,
    }


def scan_metadata(video_root: str, metadata_path: str, *, num_workers: int = 16,
                  exts=(".mp4", ".mkv", ".webm", ".avi", ".mov")) -> dict:
    """Parallel metadata scan with JSON cache (ref StreamMixIn.get_metadata,
    data/stream.py:123-145; single-writer — in a multi-host deployment only
    process 0 runs this, others read the cached JSON)."""
    if os.path.exists(metadata_path):
        with open(metadata_path) as f:
            return json.load(f)
    files = []
    for root, _, names in os.walk(video_root):
        for name in names:
            if name.lower().endswith(exts):
                files.append(os.path.join(root, name))
    # threads, not fork: cv2 releases the GIL during decode and forking a
    # JAX-multithreaded process risks deadlock
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(num_workers) as pool:
        results = list(pool.map(probe_video, files))
    metadata = {os.path.relpath(r["path"], video_root): r for r in results}
    os.makedirs(os.path.dirname(metadata_path) or ".", exist_ok=True)
    with open(metadata_path, "w") as f:
        json.dump(metadata, f, indent=2)
    return metadata

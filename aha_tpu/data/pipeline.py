"""Async input pipeline: background batch prefetching + offline feature
extraction.

SURVEY §7 hard part #5: host-side video decode must outrun TPU scoring/
training. The reference leans on torch DataLoader workers
(`/root/reference/train.py` via HF Trainer) and a submitit-sharded offline
feature extractor (`/root/reference/data/utils.py:133-151`). Here:

  * `batch_iterator` — shuffled epochs -> collated batches, decoded by a
    thread pool and prefetched ahead of the consumer (cv2/libav release
    the GIL, so threads give real decode parallelism without fork hazards
    in a JAX process);
  * `extract_features` — pre-encode videos to on-disk .npy visual embeds,
    sharded across hosts with `utils.dist.shard_iterable`;
  * `FeatureSource` — dataset frame_loader that reads those .npy files
    (skip the vision tower at train time, the reference's
    `distributed_encode` pattern).
"""

from __future__ import annotations

import os
import queue
import random
import threading

import numpy as np

from aha_tpu.data.collator import collate
from aha_tpu.utils import dist


_DONE = object()


class _Raise:
    """Private wrapper so producer errors are unambiguous even if the
    wrapped iterable legitimately yields exception objects as items."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def prefetch_iterable(it, depth: int = 2):
    """Yield `it`'s items in order, computed up to `depth` ahead by a daemon
    thread. The eval drivers wrap their dataset loops with this so host
    video decode (cv2/libav, GIL-releasing) overlaps device scoring of the
    previous video. Exceptions from the producer re-raise at the consumer."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def producer():
        try:
            for x in it:
                if stop.is_set():
                    return
                q.put(x)
            q.put(_DONE)
        except BaseException as e:            # re-raised consumer-side
            q.put(_Raise(e))

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            x = q.get()
            if x is _DONE:
                break
            if isinstance(x, _Raise):
                raise x.exc
            yield x
    finally:
        stop.set()
        try:                                   # unblock a full q.put
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def batch_iterator(
    dataset,
    tokenizer,
    *,
    batch_size: int,
    v_placeholder_id: int,
    frame_num_tokens: int,
    seed: int = 0,
    num_epochs: int | None = None,
    prefetch: int = 2,
    num_workers: int = 2,
    shard_across_hosts: bool = True,
    **collate_kw,
):
    """Yields collated batch dicts, prefetched by a background thread."""
    rng = random.Random(seed)

    def index_stream():
        epoch = 0
        while num_epochs is None or epoch < num_epochs:
            order = list(range(len(dataset)))
            rng.shuffle(order)
            if shard_across_hosts and dist.process_count() > 1:
                # truncate to the shortest host shard: every process must
                # yield the SAME number of batches per epoch or the hosts
                # that run longer deadlock in the step's collectives
                order = list(dist.shard_iterable(order))
                order = order[: len(dataset) // dist.process_count()]
            for i in range(0, len(order) - batch_size + 1, batch_size):
                yield order[i : i + batch_size]
            epoch += 1

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def producer():
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(num_workers) as pool:
            for idxs in index_stream():
                if stop.is_set():
                    break
                examples = list(pool.map(dataset.__getitem__, idxs))
                batch = collate(
                    examples, tokenizer,
                    v_placeholder_id=v_placeholder_id,
                    frame_num_tokens=frame_num_tokens,
                    **collate_kw,
                ).asdict()
                q.put(batch)
        q.put(None)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
    finally:
        stop.set()
        # drain so the producer can exit its q.put
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def extract_features(
    video_paths: list[str],
    engine,                      # StreamEngine (encode_frames)
    output_dir: str,
    *,
    output_fps: float,
    output_size: int = 384,
    max_frames: int | None = None,
    shard: bool = True,
) -> list[str]:
    """Pre-encode videos to [T, F, H] .npy embeds (host-sharded)."""
    from aha_tpu.data import media

    os.makedirs(output_dir, exist_ok=True)
    paths = list(dist.shard_iterable(video_paths)) if shard else video_paths
    written = []
    for path in paths:
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(output_dir, f"{name}.npy")
        if os.path.exists(out_path):
            written.append(out_path)
            continue
        frames, _ = media.decode_video(
            path, output_fps=output_fps, output_size=output_size,
            max_frames=max_frames,
        )
        if frames.shape[0] == 0:
            continue
        embeds = np.asarray(engine.encode_frames(frames), np.float32)
        np.save(out_path, embeds)
        written.append(out_path)
    return written


class FeatureSource:
    """frame_loader over pre-extracted .npy embeds. Returns embeds, not
    pixels — pair with a dataset configured for pre-encoded features."""

    def __init__(self, feature_dir: str):
        self.feature_dir = feature_dir

    def __call__(self, video_uid: str, load_range: range) -> np.ndarray:
        name = os.path.splitext(video_uid)[0]
        arr = np.load(os.path.join(self.feature_dir, f"{name}.npy"), mmap_mode="r")
        return np.asarray(arr[load_range.start : load_range.stop])

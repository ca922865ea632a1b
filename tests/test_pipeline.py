"""Async input pipeline tests."""

import numpy as np

from aha_tpu.config import aha_tiny
from aha_tpu.data.datasets import StreamDataset, build_grounding_annos
from aha_tpu.data.pipeline import batch_iterator, extract_features, FeatureSource
from aha_tpu.models import aha


def _dataset(cfg, tok, n_videos=4):
    meta = {f"vid{i}": {"duration": 6.0, "fps": 30.0, "valid": True, "path": "x"}
            for i in range(n_videos)}
    annos = build_grounding_annos(
        [{"video_uid": f"vid{i}", "query": f"thing {i}", "timestamps": [[1.0, 3.0]]}
         for i in range(n_videos)],
        meta, frame_fps=1.0,
    )
    r = cfg.frame_resolution

    def frame_loader(uid, rng):
        seed = int(uid[3:])
        return np.random.default_rng(seed).integers(
            0, 255, (rng.stop - rng.start, r, r, 3)).astype(np.uint8)

    return StreamDataset("grounding", annos, tok, metadata=meta,
                         frame_loader=frame_loader, frame_fps=1.0,
                         frame_size=r, max_num_frames=6)


def test_batch_iterator_prefetch():
    cfg = aha_tiny(vocab_size=256)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    ds = _dataset(cfg, tok)
    batches = list(batch_iterator(
        ds, tok, batch_size=2, v_placeholder_id=cfg.v_placeholder_id,
        frame_num_tokens=cfg.frame_num_tokens, num_epochs=2,
        len_buckets=(512,), frame_buckets=(16,),
    ))
    assert len(batches) == 4  # 4 videos / bs 2 * 2 epochs
    for b in batches:
        assert b["input_ids"].shape[0] == 2
        assert b["input_ids"].shape[1] == 512
        assert "frames" in b


def test_extract_and_feature_source(tmp_path):
    import cv2

    cfg = aha_tiny(vocab_size=256)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    from aha_tpu.ops.kv_cache import CachePolicy
    from aha_tpu.streaming.engine import StreamEngine

    engine = StreamEngine(params, cfg, CachePolicy(kind="none", window=64))
    vid = tmp_path / "clipA.mp4"
    out = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 4.0, (48, 32))
    for i in range(16):
        out.write(np.full((32, 48, 3), i * 15, np.uint8))
    out.release()

    written = extract_features([str(vid)], engine, str(tmp_path / "feat"),
                               output_fps=2.0, output_size=cfg.frame_resolution)
    assert len(written) == 1
    src = FeatureSource(str(tmp_path / "feat"))
    embeds = src("clipA.mp4", range(0, 4))
    assert embeds.shape == (4, cfg.frame_num_tokens, cfg.llm.hidden_size)


def test_prefetch_iterable_order_and_errors():
    import pytest

    from aha_tpu.data.pipeline import prefetch_iterable

    assert list(prefetch_iterable(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        yield 2
        raise ValueError("decode failed")

    it = prefetch_iterable(boom(), depth=2)
    assert next(it) == 1 and next(it) == 2
    with pytest.raises(ValueError, match="decode failed"):
        next(it)

    # early break leaves no stuck producer (depth smaller than source)
    it = prefetch_iterable(iter(range(1000)), depth=1)
    for x in it:
        if x == 3:
            break

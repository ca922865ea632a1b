"""Data pipeline tests: label derivation, collator scatter semantics,
dataset builders on synthetic annotations, media utilities, and an
end-to-end synthetic batch through the jitted train step."""

import json

import numpy as np
import pytest

from aha_tpu.config import TrainConfig, aha_tiny
from aha_tpu.data import media
from aha_tpu.data.collator import collate
from aha_tpu.data.conversations import (
    IGNORE,
    build_example,
    informative_labels,
    max_frames_clip,
    relevance_labels,
)
from aha_tpu.data.datasets import (
    ConcatDataset,
    StreamDataset,
    build_dvc_annos,
    build_grounding_annos,
    build_hihd_annos,
    build_magqa_annos,
)
from aha_tpu.models import aha
from aha_tpu.tokenization import build_stream_tokenizer


# ---------------------------------------------------------------------------
# Label derivation (ref data/stream.py:169-196)
# ---------------------------------------------------------------------------


def test_informative_labels():
    conv = [
        {"role": "user", "content": "q"},
        {"role": "stream", "num_frames": 5, "learn": True},
        {"role": "assistant", "content": "a", "learn": True, "response_frame_num": 2},
        {"role": "stream", "num_frames": 3, "learn": False},
        {"role": "stream", "num_frames": 2, "learn": True},  # last turn: next_role=None -> 0
    ]
    assert informative_labels(conv) == [0, 0, 0, 1, 1] + [IGNORE] * 3 + [0, 0]


def test_relevance_labels_spans_and_scalar():
    conv = [
        {"role": "stream", "num_frames": 4, "learn": True,
         "related": [{"related": False, "num_frames": 1}, {"related": True, "num_frames": 3}]},
        {"role": "stream", "num_frames": 2, "learn": False},
        {"role": "stream", "num_frames": 1, "learn": True, "related": 0.37},
    ]
    assert relevance_labels(conv) == [0.0, 1.0, 1.0, 1.0, -100.0, -100.0, 0.37]


def test_max_frames_clip():
    conv = [
        {"role": "user", "content": "q"},
        {"role": "stream", "num_frames": 6, "learn": True},
        {"role": "assistant", "content": "a"},
        {"role": "stream", "num_frames": 6, "learn": True},
        {"role": "assistant", "content": "b"},
    ]
    clipped, rng = max_frames_clip(conv, range(0, 12), 8)
    assert [m.get("num_frames") for m in clipped] == [None, 6, None, 2]
    assert rng == range(0, 8)
    # boundary: cum == max -> conversation cut before the stream turn
    clipped2, _ = max_frames_clip(conv, range(0, 12), 6)
    assert len(clipped2) == 2 and clipped2[1]["num_frames"] == 6


# ---------------------------------------------------------------------------
# Collator (ref data/data_collator.py:7-53)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tok():
    return build_stream_tokenizer(frame_num_tokens=3, vocab_size=512)


def test_collator_label_scatter(tok):
    conv = [
        {"role": "stream", "num_frames": 2, "learn": True},
        {"role": "assistant", "content": "hi", "learn": True},
    ]
    ex = build_example(conv, tok, system_prompt="s")
    ex.informative_labels = [0, 1]
    ex.relevance_labels = [0.25, 0.75]
    batch = collate([ex], tok, v_placeholder_id=tok.v_placeholder_id,
                    frame_num_tokens=3, len_buckets=(64,))
    ids = batch.input_ids[0]
    T = ids.shape[0]
    assert T == 64

    # LM labels: positions t-1 predict assistant content + eos tokens
    lab = batch.labels[0]
    learned = np.where(lab != IGNORE)[0]
    assert len(learned) == len("hi") + 1  # content + eos
    np.testing.assert_array_equal(lab[learned], ids[learned + 1])
    decoded = tok.decode(lab[learned], skip_special_tokens=False)
    assert decoded == "hi<|im_end|>"

    # frame labels on the LAST placeholder token of each frame
    ph = np.where(ids == tok.v_placeholder_id)[0]
    assert len(ph) == 6
    info = batch.informative_labels[0]
    rel = batch.relevance_labels[0]
    np.testing.assert_array_equal(info[ph[2::3]], [0, 1])
    np.testing.assert_allclose(rel[ph[2::3]], [0.25, 0.75])
    assert (info[ph[0::3]] == IGNORE).all() and (info[ph[1::3]] == IGNORE).all()


def test_collator_left_padding(tok):
    short = build_example(
        [{"role": "user", "content": "q"},
         {"role": "assistant", "content": "a", "learn": True}],
        tok, system_prompt="s")
    long = build_example(
        [{"role": "user", "content": "q"},
         {"role": "assistant", "content": "a much longer reply", "learn": True}],
        tok, system_prompt="s")
    batch = collate([short, long], tok, v_placeholder_id=tok.v_placeholder_id,
                    frame_num_tokens=3, len_buckets=(64,))
    # left padded: row 0 starts with pads
    assert not batch.attention_mask[0, 0]
    assert batch.attention_mask[0, -1]
    assert batch.attention_mask[1].sum() > batch.attention_mask[0].sum()


# ---------------------------------------------------------------------------
# Dataset builders on synthetic annotations
# ---------------------------------------------------------------------------


def _meta(duration=20.0):
    return {"vidA": {"duration": duration, "fps": 30.0, "valid": True, "path": "x"}}


def test_build_dvc():
    annos = {"vidA": {"ann1": [
        {"text": "first", "time": 4.0, "timespan": [0.0, 4.0]},
        {"text": "second", "time": 8.0, "timespan": [4.0, 8.0]},
    ]}}
    out = build_dvc_annos(annos, _meta(), frame_fps=1.0)
    assert len(out) == 1
    conv = out[0]["conversation"]
    rolls = [m["role"] for m in conv]
    assert rolls == ["stream", "assistant", "stream", "assistant"]
    assert conv[0]["num_frames"] == 4
    # response starts at ceil(mean(0,4))=2 -> (4-2)*1+1 = 3 frames
    assert conv[1]["response_frame_num"] == 3
    assert out[0]["load_range"] == range(0, 8)
    info = informative_labels(conv)
    assert info == [0, 1, 1, 1, 0, 1, 1, 1]


def test_build_magqa():
    import random as _random

    annos = [{
        "video_uid": "vidA",
        "conversation": [
            {"role": "user", "content": "what is this?", "time": 3.0},
            {"role": "assistant", "content": "a cat", "time": 6.0, "timespan": [4.0, 6.0]},
            {"role": "user", "content": "and now?", "time": 8.0},
            {"role": "assistant", "content": "a dog", "time": 10.0, "timespan": [8.0, 10.0]},
        ],
    }]
    out = build_magqa_annos(annos, _meta(), frame_fps=1.0, rng=_random.Random(0))
    assert len(out) == 1
    conv = out[0]["conversation"]
    roles = [m["role"] for m in conv]
    assert roles.count("assistant") == 2 and roles.count("user") == 2
    n_frames = sum(m.get("num_frames", 0) for m in conv if m["role"] == "stream")
    assert out[0]["load_range"].stop - out[0]["load_range"].start == n_frames


def test_build_grounding():
    import random as _random

    annos = [{"video_uid": "vidA", "query": "the red car",
              "timestamps": [[2.0, 5.0], [10.0, 12.0]]}]
    out = build_grounding_annos(annos, _meta(duration=15.0), frame_fps=1.0,
                                rng=_random.Random(1))
    conv = out[0]["conversation"]
    assert conv[0]["role"] == "user" and "red car" in conv[0]["content"]
    stream = conv[1]
    assert stream["num_frames"] == 15
    rel = relevance_labels(conv)
    want = [0] * 2 + [1] * 3 + [0] * 5 + [1] * 2 + [0] * 3
    assert rel == [float(x) for x in want]


def test_build_hihd():
    annos = {"yt1": {"scores": [0.1, 0.9, 0.4], "query": "skiing",
                     "duration": 20.0, "video_uid": "vidA"}}
    out = build_hihd_annos(annos, _meta(), frame_fps=1.0)
    conv = out[0]["conversation"]
    assert conv[0]["role"] == "user"
    assert [m["num_frames"] for m in conv[1:]] == [1, 1, 1]
    assert relevance_labels(conv) == [0.1, 0.9, 0.4]
    # every stream turn is followed by another stream (or nothing) -> all 0
    assert informative_labels(conv) == [0, 0, 0]


# ---------------------------------------------------------------------------
# End-to-end: synthetic dataset -> collate -> train step
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_dataset_to_train_step(tok):
    cfg = aha_tiny(vocab_size=512)
    params, cfg, tok2 = aha.build_model_and_tokenizer(cfg, seed=0)

    meta = _meta(duration=10.0)
    annos = build_grounding_annos(
        [{"video_uid": "vidA", "query": "thing", "timestamps": [[2.0, 5.0]]}],
        meta, frame_fps=1.0,
    )
    r = cfg.frame_resolution

    def frame_loader(uid, rng):
        return np.random.default_rng(0).integers(
            0, 255, (rng.stop - rng.start, r, r, 3)).astype(np.uint8)

    ds = StreamDataset("grounding", annos, tok2, metadata=meta,
                       frame_loader=frame_loader, frame_fps=1.0,
                       frame_size=r, max_num_frames=8)
    ex = ds[0]
    assert ex.frames.shape[0] == ex.num_frames == 8  # clipped from 10
    assert ex.relevance_labels is not None and ex.informative_labels is None

    batch = collate([ex], tok2, v_placeholder_id=cfg.v_placeholder_id,
                    frame_num_tokens=cfg.frame_num_tokens,
                    len_buckets=(128,), frame_buckets=(8,))
    from aha_tpu.train.trainer import init_train_state, make_train_step
    import jax.numpy as jnp

    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1)
    state, tx, labels, scale = init_train_state(cfg, train_cfg, params, total_steps=3)
    step = make_train_step(cfg, train_cfg, tx, labels, scale)
    jbatch = {k: jnp.asarray(v) for k, v in batch.asdict().items()}
    state, parts = step(state, jbatch)
    assert np.isfinite(float(parts.total))
    assert float(parts.relevance) > 0  # relevance supervision active


def test_concat_dataset():
    class Fake:
        def __init__(self, tag, n):
            self.tag, self.n = tag, n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return (self.tag, i)

    ds = ConcatDataset([Fake("a", 3), Fake("b", 2)])
    assert len(ds) == 5
    assert ds[0] == ("a", 0) and ds[2] == ("a", 2)
    assert ds[3] == ("b", 0) and ds[4] == ("b", 1)


# ---------------------------------------------------------------------------
# Media utilities
# ---------------------------------------------------------------------------


def test_fps_quantizers():
    assert media.ceil_time_by_fps(3.2, 2, 0, 100) == 3.5
    assert media.floor_time_by_fps(3.2, 2, 0, 100) == 3.0
    assert media.round_time_by_fps(3.2, 2, 0, 100) == 3.0
    assert media.ceil_time_by_fps(3.2, 2, 0, 3.0) == 3.0  # clamped


def test_resize_and_pad():
    frame = np.full((100, 200, 3), 255, np.uint8)
    out = media.resize_and_pad_frame(frame, 64)
    assert out.shape == (64, 64, 3)
    # letterbox: top/bottom black bars
    assert out[0].sum() == 0 and out[-1].sum() == 0
    assert out[32].sum() > 0
    nh, nw, top, left = media.letterbox_params(100, 200, 64)
    assert (nh, nw, left) == (32, 64, 0) and top == 16


def test_dropout_simulation_types():
    frame = np.random.default_rng(0).integers(0, 255, (96, 128, 3)).astype(np.uint8)
    for t in ("quality", "block_noise", "color_banding", "blackout"):
        out = media.dropout_simulation(frame, 128, 96, t, np.random.default_rng(1))
        assert out.shape == frame.shape
    assert media.dropout_simulation(frame, 128, 96, "blackout").sum() == 0
    banded = media.dropout_simulation(frame, 128, 96, "color_banding")
    assert set(np.unique(banded)) <= {0, 64, 128, 192}


def test_dropout_segments_seeded():
    segs1 = media.generate_dropout_segments(300.0, seed=7)
    segs2 = media.generate_dropout_segments(300.0, seed=7)
    assert segs1 == segs2
    total = sum(e - s for s, e, _ in segs1)
    assert 0.04 * 300 <= total <= 0.21 * 300
    for (s1, e1, _), (s2, e2, _) in zip(segs1, segs1[1:]):
        assert e1 <= s2  # sorted, non-overlapping


def test_dataset_corrupt_fallback_bounded(tok):
    """All-corrupt dataset raises instead of recursing forever."""
    from aha_tpu.data.datasets import StreamDataset

    annos = [{"conversation": [{"role": "user", "content": "q"}],
              "load_range": range(0, 3), "video_uid": "missing"}] * 3

    def bad_loader(uid, rng):
        raise IOError("decode failed")

    ds = StreamDataset("grounding", annos, tok, frame_loader=bad_loader,
                       frame_fps=1.0, frame_size=32, max_num_frames=4)
    with pytest.raises(Exception):
        ds[0]


@pytest.mark.slow
def test_cli_train_end_to_end(tmp_path):
    """The full train CLI: synthetic videos + grounding annos + mixture
    config -> a few optimizer steps with checkpoints + adapter export."""
    cv2 = pytest.importorskip("cv2")
    from aha_tpu.cli import cmd_train

    vids = tmp_path / "videos"
    vids.mkdir()
    for name in ("v0", "v1"):
        w = cv2.VideoWriter(str(vids / f"{name}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), 4.0, (48, 32))
        for i in range(16):
            w.write(np.full((32, 48, 3), (i * 16) % 255, np.uint8))
        w.release()

    annos = [{"video_uid": f"v{i}.mp4", "query": f"thing {i}",
              "timestamps": [[1.0, 3.0]]} for i in range(2)]
    anno_file = tmp_path / "train.json"
    anno_file.write_text(json.dumps(annos))
    config = [{
        "dataset_cls": "GroundingStreamDataset",
        "video_root": str(vids),
        "anno_file": str(anno_file),
        "metadata_path": str(tmp_path / "meta.json"),
        "frame_fps": 1.0,
        "max_num_frames": 4,
    }]
    cfg_file = tmp_path / "mixture.json"
    cfg_file.write_text(json.dumps(config))
    out_dir = tmp_path / "train_out"

    cmd_train([
        "--model_preset", "tiny",
        "--dataset_config", str(cfg_file),
        "--output_dir", str(out_dir),
        "--num_steps", "2",
        "--batch_size", "1",
        "--grad_accum_steps", "1",
        "--learning_rate", "1e-3",
    ])
    assert (out_dir / "metrics.jsonl").exists()
    ckpts = list((out_dir / "checkpoints").iterdir())
    assert ckpts
    assert (out_dir / "adapter").exists()

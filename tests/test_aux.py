"""Auxiliary subsystem tests: telemetry, dist helpers, live-video demo,
visualization."""

import json

import numpy as np
import pytest

from aha_tpu.config import InferConfig, aha_tiny
from aha_tpu.drivers import live_video, visualize
from aha_tpu.models import aha
from aha_tpu.streaming.session import build_session
from aha_tpu.utils import dist, telemetry


def test_device_monitor():
    import jax

    mon = telemetry.DeviceMonitor(sample_interval_seconds=0.01).start()
    x = jax.numpy.ones((256, 256))
    (x @ x).block_until_ready()
    mon.stop()
    rep = mon.report()
    assert rep["samples"] >= 1
    assert rep["peak_ram_gb"] > 0


def test_step_timer():
    t = telemetry.StepTimer()
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["n"] == 3 and s["p50_ms"] >= 0


def test_dist_helpers():
    assert dist.process_index() == 0
    assert dist.process_count() == 1
    assert dist.is_main_process()
    items = list(dist.shard_iterable(range(10), num_shards=3, shard_id=1))
    assert items == [1, 4, 7]
    dist.set_seed(0)


def test_tag_important_segments():
    segs = [
        {"start": 0, "end": 2, "text": "ok"},
        {"start": 2, "end": 5, "text": "take a photo of the door"},
        {"start": 5, "end": 6, "text": "yes okay"},
    ]
    tagged = live_video.tag_important_segments(segs)
    assert [s["important"] for s in tagged] == [False, True, False]
    ticks = live_video.segments_to_gt_ticks(tagged)
    assert ticks == [3.5]


@pytest.fixture(scope="module")
def tiny_session():
    cfg = aha_tiny(vocab_size=256)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    return build_session(params, cfg, tok, InferConfig(
        frame_fps=2.0, frame_resolution=cfg.frame_resolution,
        grounding_mode=True, kv_cache_policy="sink", kv_window=64, num_sink_tokens=4))


@pytest.mark.slow
def test_infer_on_live_video(tiny_session, tmp_path):
    cfg = tiny_session.cfg
    r = cfg.frame_resolution
    frames = np.random.default_rng(0).integers(0, 255, (20, r, r, 3), dtype=np.uint8)
    mon = telemetry.DeviceMonitor(0.05)
    out = live_video.infer_on_live_video(
        tiny_session, frames, "what is happening?", fps=2.0,
        output_dir=str(tmp_path), gt_ticks=[3.0], monitor=mon,
    )
    assert len(out["debug_data"]) == 20
    assert "telemetry" in out
    assert (tmp_path / "live_scores.json").exists()
    assert (tmp_path / "live_scores.png").exists()


def test_motion_mask_static_and_moving():
    from aha_tpu.data import media

    rng = np.random.default_rng(3)
    moving = rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
    static = np.zeros((10, 16, 16, 3), np.uint8)        # 10 identical frames
    frames = np.concatenate([static, moving], axis=0)
    keep = media.motion_mask(frames, 0.02, max_skip=4)
    assert keep[0] and keep.dtype == bool and keep.shape == (14,)
    # static run: only the max_skip heartbeat frames are kept
    assert list(np.flatnonzero(keep[:10])) == [0, 4, 8]
    # every random frame differs from its predecessor: all kept
    assert keep[10:].all()
    # threshold high enough: only heartbeats survive even in motion
    keep_hi = media.motion_mask(frames, 1.0, max_skip=5)
    assert list(np.flatnonzero(keep_hi)) == [0, 5, 10]
    assert media.motion_mask(frames[:0], 0.02).shape == (0,)


@pytest.mark.slow
def test_infer_on_live_video_motion_skip(tiny_session):
    """Score-and-hold: held frames copy the last scored frame's scores on
    the uniform grid; frames_scored reports the compression."""
    cfg = tiny_session.cfg
    r = cfg.frame_resolution
    rng = np.random.default_rng(1)
    moving = rng.integers(0, 255, (6, r, r, 3), dtype=np.uint8)
    frames = np.concatenate([np.repeat(moving[:1], 8, axis=0), moving], axis=0)
    out = live_video.infer_on_live_video(
        tiny_session, frames, "what is happening?", fps=2.0,
        motion_skip_threshold=0.02, motion_max_skip=4,
    )
    dbg = out["debug_data"]
    assert len(dbg) == 14
    assert out["frames_scored"] == 8   # heartbeats {0,4} + moving {8..13}
    assert [d["time"] for d in dbg] == [t / 2.0 for t in range(14)]
    held = [d for d in dbg if not d["scored"]]
    assert held, "static span must produce held frames"
    for i, d in enumerate(dbg):
        if not d["scored"]:
            prev = next(p for p in reversed(dbg[:i]) if p["scored"])
            assert d["relevance_score"] == prev["relevance_score"]


def test_render_demo_video(tmp_path):
    pytest.importorskip("cv2")
    frames = np.random.default_rng(0).integers(0, 255, (12, 48, 64, 3), dtype=np.uint8)
    scores = np.random.default_rng(1).random(12)
    out = live_video.render_demo_video(frames, scores, 2.0,
                                       str(tmp_path / "demo.mp4"), ticks=[2.0])
    import cv2

    cap = cv2.VideoCapture(out)
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 12
    assert cap.get(cv2.CAP_PROP_FRAME_HEIGHT) == 48 + 160
    cap.release()


def test_visualize_benchmark(tmp_path):
    pred = {
        "video_uuid": "vidA",
        "debug_data": [
            dict(time=float(t), informative_score=0.5, relevance_score=0.5,
                 uncertainty_score=0.1) for t in range(10)
        ],
    }
    pred_file = tmp_path / "pred.json"
    pred_file.write_text(json.dumps([pred]))
    params_file = tmp_path / "params.json"
    params_file.write_text(json.dumps(
        {"tvsum": {"alpha": 0.5, "beta": 1.0, "epsilon": 0.0,
                   "uncertainty_threshold": 0.1}}))
    gt = np.random.default_rng(0).random(10)
    out = visualize.visualize_benchmark(
        str(pred_file), str(params_file), "tvsum", lambda v: gt, str(tmp_path / "plots"))
    assert len(out) == 1
    import os

    assert os.path.exists(out[0])


def test_tick_table_roundtrip(tmp_path):
    # legacy flat-float schema -> zero-length spans
    table = {"arl_scout": {"ticks": [10.0, 55.0], "label": "demo"}}
    p = tmp_path / "ticks.json"
    p.write_text(json.dumps(table))
    spans = live_video.load_tick_table(str(p), "arl_scout")
    assert spans == [(10.0, 10.0, ""), (55.0, 55.0, "")]
    assert live_video.spans_to_ticks(spans) == [10.0, 55.0]


def test_tick_table_reference_spans():
    """The committed demo table carries the reference's hand-labeled GT
    verbatim (infer_live_video.py:14-68)."""
    spans = live_video.load_tick_table(
        "configs/tick_tables/demo_ticks.json", "arl_scout")
    assert len(spans) == 31
    assert spans[0] == (0.0, 0.0, "TV")
    assert spans[6] == (131.0, 161.0, "static at door")
    assert spans[-1] == (1031.0, 1031.0, "switch angle")
    hubble = live_video.load_tick_table(
        "configs/tick_tables/demo_ticks.json", "hubble_space")
    assert len(hubble) == 18
    assert hubble[0] == (590.0, 590.0, "Launch")
    assert hubble[-1] == (3299.0, 3299.0, "Astronauts exiting Shuttle")


def test_flops_estimate():
    import jax.numpy as jnp

    def f(a, b):
        return a @ b

    x = jnp.ones((64, 128))
    y = jnp.ones((128, 32))
    cost = telemetry.flops_estimate(f, x, y)
    # 2*M*N*K flops expected (allow backend fudge)
    assert cost["flops"] >= 2 * 64 * 128 * 32 * 0.5


def test_write_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from aha_tpu.data.media import write_video

    frames = np.random.default_rng(0).integers(0, 255, (6, 32, 48, 3), dtype=np.uint8)
    out = str(tmp_path / "w.mp4")
    assert write_video(frames, out, 4.0) == 6
    cap = cv2.VideoCapture(out)
    assert cap.get(cv2.CAP_PROP_FRAME_COUNT) == 6
    cap.release()


def test_inference_scripts_exist_and_parse():
    """All 12 reference ablation scripts have named equivalents that at
    least pass bash -n (ref scripts/inference/)."""
    import glob
    import subprocess

    expected = {"tvsum", "tvsum_degraded", "tvsum_prompt", "tvsum_cache",
                "tvsum_cache_static", "tvsum_cache_static_sink", "hisum",
                "charades", "magqa", "youcook2", "arl_scout", "grid_search"}
    have = {s.rsplit("/", 1)[1][:-3] for s in glob.glob("scripts/inference/*.sh")}
    assert expected <= have, expected - have
    for sh in glob.glob("scripts/inference/*.sh"):
        subprocess.run(["bash", "-n", sh], check=True)


def test_params_file_fallback(tmp_path, capsys):
    """evaluate/highlight/visualize fall back to the committed reference
    calibration when outputs/grid_search_params.json is absent."""
    from aha_tpu.cli import _resolve_params_file

    missing = str(tmp_path / "nope" / "grid_search_params.json")
    resolved = _resolve_params_file(missing)
    assert resolved.endswith("configs/grid_search_params.default.json")
    with open(resolved) as f:
        params = json.load(f)
    # the published paper values (ref outputs/grid_search_params.json)
    assert params["tvsum"] == {"alpha": 0.0, "beta": -1.0, "epsilon": -5.0,
                               "uncertainty_threshold": 0.04}
    assert abs(params["qvh"]["beta"] - 1.5555555555555554) < 1e-12
    assert params["arl_scout"]["beta"] == 1.5555
    # an existing file wins over the fallback
    p = tmp_path / "mine.json"
    p.write_text("{}")
    assert _resolve_params_file(str(p)) == str(p)


def test_compile_cache_enable(tmp_path, monkeypatch):
    """enable() points jax at a writable on-disk cache; AHA_COMPILE_CACHE=0
    disables; a second jitted process would hit the persisted entry (that
    cross-process property is jax's own contract — here we assert the
    config wiring and that compilation with the cache enabled still runs)."""
    import jax
    import jax.numpy as jnp

    from aha_tpu.utils import compile_cache

    d = tmp_path / "xla_cache"
    monkeypatch.setenv("AHA_COMPILE_CACHE_DIR", str(d))
    prev = jax.config.jax_compilation_cache_dir
    try:
        assert compile_cache.enable() == str(d)
        assert d.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(d)
        # compilation still works with the cache on
        assert float(jax.jit(lambda x: x * 2)(jnp.float32(3))) == 6.0

        monkeypatch.setenv("AHA_COMPILE_CACHE", "0")
        assert compile_cache.enable() is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

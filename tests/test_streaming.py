"""StreamSession / StreamEngine tests.

Golden-consistency strategy: the streaming chunked path (ids chunks + frame
chunks + while_loop decode over the ring cache) must reproduce a single
full-sequence causal forward over the equivalent token/embed sequence —
the property the reference relies on implicitly by using one HF attention
with a growing cache (`/root/reference/test/inference.py:196-281`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.config import InferConfig, aha_tiny
from aha_tpu.models import aha, qwen2
from aha_tpu.ops.kv_cache import CachePolicy
from aha_tpu.streaming.engine import StreamEngine, _apply_repetition_penalty
from aha_tpu.streaming.session import StreamSession, build_session


@pytest.fixture(scope="module")
def tiny_model():
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tokenizer = aha.build_model_and_tokenizer(cfg, seed=0)
    return params, cfg, tokenizer


def make_session(tiny_model, **overrides) -> StreamSession:
    params, cfg, tokenizer = tiny_model
    defaults = dict(
        frame_fps=1.0,
        stream_end_prob_threshold=5.0,  # informative+relevance < 2: never fires
        kv_cache_policy="none",
        kv_window=2048,
        max_new_tokens=16,
        system_prompt="sys prompt",
    )
    defaults.update(overrides)
    return build_session(params, cfg, tokenizer, InferConfig(**defaults))


def frames_for(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    r = cfg.frame_resolution
    return rng.integers(0, 255, size=(n, r, r, 3), dtype=np.uint8)


def full_forward_scores(params, cfg, id_chunks, frame_embeds_seq):
    """Oracle: one causal forward over the concatenated embeds.

    id_chunks: list of (position-ordered) token-id lists; frame_embeds_seq:
    list of (insert_after_chunk_idx, [F, H] embeds). Returns per-frame
    (info, rel, unc) at each frame's last token.
    """
    segs = []
    frame_last_positions = []
    pos = 0
    for item in id_chunks:
        if isinstance(item, list):  # token ids
            emb = qwen2.embed_tokens(params["llm"], jnp.asarray(item, jnp.int32))
            segs.append(emb)
            pos += emb.shape[0]
        else:  # frame embeds [F, H]
            segs.append(item)
            pos += item.shape[0]
            frame_last_positions.append(pos - 1)
    full = jnp.concatenate(segs, axis=0)[None]  # [1, T, H]
    hidden = qwen2.forward_hidden(params["llm"], cfg.llm, full)
    outs = aha.apply_heads(params, cfg, hidden)
    info = jax.nn.softmax(outs.informative_logits[0], axis=-1)[:, 1]
    rel = outs.relevance[0]
    unc = jnp.exp(outs.log_variance[0])
    idx = jnp.asarray(frame_last_positions)
    return np.asarray(info[idx]), np.asarray(rel[idx]), np.asarray(unc[idx])


@pytest.mark.slow
def test_session_matches_full_forward(tiny_model):
    params, cfg, tokenizer = tiny_model
    sess = make_session(tiny_model)
    frames = frames_for(cfg, 5)
    sess.input_video_stream(frames)
    sess.input_query_stream([{"role": "user", "content": "what happens?", "time": 0}])
    sess.inference()
    got = sess.debug_data_list
    assert len(got) == 5

    # oracle sequence: query chunk first (time-0 query precedes vision init),
    # then system ids, then the 5 frames back to back
    query_ids = tokenizer.apply_chat_template(
        [{"role": "user", "content": "what happens?"}],
        add_stream_query_prompt=False,
        add_stream_prompt=True,
    )
    embeds = sess.engine.encode_frames(frames)
    chunks = [query_ids, sess._start_ids] + [embeds[i] for i in range(5)]
    info, rel, unc = full_forward_scores(params, cfg, chunks, None)

    np.testing.assert_allclose([d["informative_score"] for d in got], info, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose([d["relevance_score"] for d in got], rel, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose([d["uncertainty_score"] for d in got], unc, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_score_video_matches_inference_loop(tiny_model):
    params, cfg, tokenizer = tiny_model
    frames = frames_for(cfg, 6, seed=3)

    loop = make_session(tiny_model)
    loop.input_video_stream(frames)
    loop.input_query_stream([{"role": "user", "content": "q", "time": 0}])
    loop.inference()

    fast = make_session(tiny_model)
    out = fast.score_video(frames, query="q")

    for a, b in zip(loop.debug_data_list, out):
        for k in ("informative_score", "relevance_score", "uncertainty_score"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_sink_policy_session_runs(tiny_model):
    """Small sink cache forces eviction + re-rotation mid-stream."""
    _, cfg, _ = tiny_model
    sess = make_session(tiny_model, kv_cache_policy="sink", kv_window=24, num_sink_tokens=4)
    frames = frames_for(cfg, 40, seed=1)
    sess.input_video_stream(frames)
    sess.inference()
    assert len(sess.debug_data_list) == 40
    assert all(np.isfinite(d["informative_score"]) for d in sess.debug_data_list)
    assert int(sess.cache.length[0]) <= 24


@pytest.mark.slow
def test_generation_trigger_and_rollback(tiny_model):
    _, cfg, _ = tiny_model
    # threshold 0 -> fires on every frame
    sess = make_session(tiny_model, stream_end_prob_threshold=0.0, remove_assistant_turns=True)
    frames = frames_for(cfg, 3, seed=2)
    sess.input_video_stream(frames)
    pre_len_after_first = None
    responses = sess.inference()
    assistant_turns = [r for r in responses if r["role"] == "assistant"]
    assert len(assistant_turns) == 3
    assert all(isinstance(r["content"], str) for r in assistant_turns)
    # rollback: cache holds only system + 3 frames worth of tokens
    expected = len(sess._start_ids) + 3 * cfg.frame_num_tokens
    assert int(sess.cache.length[0]) == expected


@pytest.mark.slow
def test_generation_kept_turns_extend_cache(tiny_model):
    _, cfg, _ = tiny_model
    sess = make_session(tiny_model, stream_end_prob_threshold=0.0, remove_assistant_turns=False)
    frames = frames_for(cfg, 2, seed=2)
    sess.input_video_stream(frames)
    responses = sess.inference()
    assert sum(r["role"] == "assistant" for r in responses) == 2
    min_len = len(sess._start_ids) + 2 * cfg.frame_num_tokens
    assert int(sess.cache.length[0]) > min_len


@pytest.mark.slow
def test_greedy_decode_matches_naive_reforward(tiny_model):
    """while_loop decode over the cache == argmax over a full re-forward at
    every step (the reference decode semantics, modeling_live.py:64-90)."""
    params, cfg, tokenizer = tiny_model
    policy = CachePolicy(kind="none", window=256)
    engine = StreamEngine(params, cfg, policy, max_new_tokens=12)
    prompt = tokenizer.apply_chat_template([{"role": "system", "content": "hi"}])

    cache = engine.new_cache()
    _, out_ids, out_len, _, last_tok = engine.generate(cache, [prompt], engine.new_rep_counts())
    n = int(out_len[0])
    got = list(np.asarray(out_ids[0, :n]))

    # naive: full causal forward over prompt+generated each step
    ids = list(prompt)
    want = []
    for _ in range(12):
        emb = qwen2.embed_tokens(params["llm"], jnp.asarray(ids, jnp.int32))[None]
        hidden = qwen2.forward_hidden(params["llm"], cfg.llm, emb)
        logits = qwen2.lm_logits(params["llm"], cfg.llm, hidden[0, -1])
        tok = int(jnp.argmax(logits))
        want.append(tok)
        if tok == cfg.eos_token_id:
            break
        ids.append(tok)
    assert got == want
    assert int(last_tok[0]) == want[-1]


def test_repetition_penalty_semantics():
    logits = jnp.asarray([[2.0, -1.0, 0.5]])
    counts = jnp.asarray([[1, 1, 0]])
    out = _apply_repetition_penalty(logits, counts, 2.0)
    np.testing.assert_allclose(np.asarray(out[0]), [1.0, -2.0, 0.5])


@pytest.mark.slow
def test_demo_input_one_frame(tiny_model):
    _, cfg, _ = tiny_model
    sess = make_session(tiny_model, stream_end_prob_threshold=0.0)
    frames = frames_for(cfg, 2, seed=5)
    embeds = sess.engine.encode_frames(frames)
    sess.encode_given_query("watch this")
    sess.input_frame_embeds(embeds[0], 0.0)
    ret = sess.input_one_frame()
    assert set(ret) >= {"frame_idx", "time", "informative_score", "relevance_score",
                        "uncertainty_score", "response"}
    assert ret["response"] is not None
    sess.input_frame_embeds(embeds[1], 1.0)
    ret2 = sess.input_one_frame()
    assert ret2["frame_idx"] == 2


@pytest.mark.slow
def test_chunked_matches_stepwise_same_time_queries(tiny_model):
    """Two queries due at the SAME timestamp: the reference encodes one
    query per frame step (`if`, not `while` — inference.py:294), so the
    order is q1, frame, q2, frame. The chunked loop must reproduce the
    stepwise loop's scores and responses for that interleaving."""
    frames = frames_for(cfg_of(tiny_model), 7, seed=21)
    conv = [
        {"role": "user", "content": "first?", "time": 2.0},
        {"role": "user", "content": "second?", "time": 2.0},
    ]

    step = make_session(tiny_model, stream_end_prob_threshold=0.5)
    step.input_video_stream(frames)
    step.input_query_stream(conv)
    resp_step = step.inference(chunked=False)

    chunk = make_session(tiny_model, stream_end_prob_threshold=0.5)
    chunk.input_video_stream(frames)
    chunk.input_query_stream(conv)
    resp_chunk = chunk.inference(chunked=True)

    assert len(step.debug_data_list) == len(chunk.debug_data_list) == 7
    for a, b in zip(step.debug_data_list, chunk.debug_data_list):
        assert a["time"] == b["time"]
        for k in ("informative_score", "relevance_score", "uncertainty_score"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=2e-5)
    assert [(r["role"], r["time"], r["content"]) for r in resp_step] == \
        [(r["role"], r["time"], r["content"]) for r in resp_chunk]


def cfg_of(tiny_model):
    return tiny_model[1]


@pytest.mark.slow
def test_chunked_inference_matches_stepwise(tiny_model):
    """The on-device trigger loop must reproduce the stepwise host loop
    exactly: same per-frame scores, same trigger frames, same responses."""
    params, cfg, tokenizer = tiny_model
    frames = frames_for(cfg, 8, seed=9)

    step = make_session(tiny_model, stream_end_prob_threshold=0.5)
    step.input_video_stream(frames)
    step.input_query_stream([{"role": "user", "content": "q", "time": 0}])
    resp_step = step.inference(chunked=False)

    chunk = make_session(tiny_model, stream_end_prob_threshold=0.5)
    chunk.input_video_stream(frames)
    chunk.input_query_stream([{"role": "user", "content": "q", "time": 0}])
    resp_chunk = chunk.inference(chunked=True)

    assert len(step.debug_data_list) == len(chunk.debug_data_list) == 8
    for a, b in zip(step.debug_data_list, chunk.debug_data_list):
        assert a["time"] == b["time"]
        for k in ("informative_score", "relevance_score", "uncertainty_score"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=2e-5)
    assert [(r["role"], r["time"]) for r in resp_step] == \
        [(r["role"], r["time"]) for r in resp_chunk]
    assert [r["content"] for r in resp_step] == [r["content"] for r in resp_chunk]


@pytest.mark.slow
def test_chunked_inference_sum_threshold(tiny_model):
    params, cfg, tokenizer = tiny_model
    frames = frames_for(cfg, 10, seed=11)
    a = make_session(tiny_model, stream_end_prob_threshold=None,
                     stream_end_score_sum_threshold=2.0)
    a.input_video_stream(frames)
    ra = a.inference(chunked=False)
    b = make_session(tiny_model, stream_end_prob_threshold=None,
                     stream_end_score_sum_threshold=2.0)
    b.input_video_stream(frames)
    rb = b.inference(chunked=True)
    assert [(r["role"], r["time"]) for r in ra] == [(r["role"], r["time"]) for r in rb]
    np.testing.assert_allclose(
        [d["relevance_score"] for d in a.debug_data_list],
        [d["relevance_score"] for d in b.debug_data_list], rtol=2e-4, atol=2e-5)


def test_chunked_inference_threshold_z_matches_stepwise(tiny_model):
    """threshold_z now runs on device in the chunked loop (the B=1
    batched trigger program + engine.z_step_host for prefix frames); it
    must reproduce the stepwise host rule exactly — same trigger frames,
    same responses, same score traces — including across the response
    boundary where the window spans a host-checked prefix frame."""
    params, cfg, tokenizer = tiny_model
    frames = frames_for(cfg, 12, seed=13)
    kw = dict(stream_end_prob_threshold=None,
              stream_end_score_sum_threshold=None,
              threshold_z=0.8, first_n_frames_no_generate=3,
              running_list_length=5, max_new_tokens=4)
    q = [{"role": "user", "content": "q", "time": 0}]

    a = make_session(tiny_model, **kw)
    a.input_video_stream(frames)
    a.input_query_stream(list(q))
    ra = a.inference(chunked=False)

    b = make_session(tiny_model, **kw)
    b.input_video_stream(frames)
    b.input_query_stream(list(q))
    rb = b.inference(chunked=True)

    assert len(a.debug_data_list) == len(b.debug_data_list) == 12
    for x, y in zip(a.debug_data_list, b.debug_data_list):
        assert x["time"] == y["time"]
        for k in ("informative_score", "relevance_score",
                  "uncertainty_score"):
            np.testing.assert_allclose(x[k], y[k], rtol=2e-4, atol=2e-5)
    assert [(r["role"], r["time"]) for r in ra] == \
        [(r["role"], r["time"]) for r in rb]
    assert [r["content"] for r in ra] == [r["content"] for r in rb]
    assert any(r["role"] == "assistant" for r in ra), \
        "fixture must exercise a z trigger"


def test_threshold_z_decision_rule():
    """The z-score stopping rule (InferConfig.threshold_z): fires when the
    current stream-end score exceeds mean + z*std of the running list, only
    after first_n_frames_no_generate frames. Pure host decision logic —
    exercised without an engine."""
    s = StreamSession.__new__(StreamSession)
    s.score_heads = ["informative_score"]
    s.stream_end_prob_threshold = None
    s.stream_end_score_sum_threshold = None
    s.threshold_z = 2.0
    s.first_n_frames_no_generate = 3
    s.running_list_length = 20
    s.stream_end_prob_list = []
    s.stream_end_score_sum = 0.0
    s.frame_idx = 0
    s.response_min_interval_frames = None
    s.last_response_frame = None

    fired = []
    for score in [0.1, 0.12, 0.11, 0.1, 0.09, 0.11, 0.9, 0.1]:
        s.frame_idx += 1
        fired.append(s._check_trigger({"informative_score": score}))
    # flat prefix never fires; the 0.9 outlier does; back-to-baseline doesn't
    assert fired[:6] == [False] * 6
    assert fired[6] is True
    assert fired[7] is False

    # before first_n_frames_no_generate nothing fires even for outliers
    s2 = StreamSession.__new__(StreamSession)
    s2.__dict__.update({k: getattr(s, k) for k in (
        "score_heads", "stream_end_prob_threshold", "stream_end_score_sum_threshold",
        "threshold_z", "running_list_length")})
    s2.first_n_frames_no_generate = 10
    s2.stream_end_prob_list = [0.1, 0.1, 0.1, 0.1]
    s2.stream_end_score_sum = 0.0
    s2.frame_idx = 5
    s2.response_min_interval_frames = None
    s2.last_response_frame = None
    assert s2._check_trigger({"informative_score": 5.0}) is False


def test_response_min_interval_frames(tiny_model):
    """The min-interval gate suppresses triggers within N frames of the
    previous response, identically in the stepwise and chunked loops, and
    reduces the response count vs the ungated run."""
    params, cfg, tokenizer = tiny_model
    frames = frames_for(cfg, 10, seed=9)

    def run(chunked, min_int):
        s = make_session(tiny_model, stream_end_prob_threshold=0.5,
                         response_min_interval_frames=min_int)
        s.input_video_stream(frames)
        s.input_query_stream([{"role": "user", "content": "q", "time": 0}])
        resp = s.inference(chunked=chunked)
        return s, resp

    base, resp_base = run(False, None)
    n_base = len([r for r in resp_base if r["role"] == "assistant"])
    assert n_base >= 3, "fixture must fire repeatedly without the gate"

    step, resp_step = run(False, 4)
    chunk, resp_chunk = run(True, 4)
    n_gated = len([r for r in resp_step if r["role"] == "assistant"])
    assert 1 <= n_gated < n_base
    # responses at least 4 frames apart (times are frame/fps at fps=1)
    times = [r["time"] for r in resp_step if r["role"] == "assistant"]
    assert all(b - a >= 4 for a, b in zip(times, times[1:]))
    # stepwise == chunked
    assert [(r["role"], r["time"]) for r in resp_step] == \
        [(r["role"], r["time"]) for r in resp_chunk]
    assert [r["content"] for r in resp_step] == \
        [r["content"] for r in resp_chunk]
    for a, b in zip(step.debug_data_list, chunk.debug_data_list):
        for k in ("informative_score", "relevance_score"):
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=2e-5)

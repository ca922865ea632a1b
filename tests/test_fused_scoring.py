"""Fused frame scoring: k frames verified per weight stream must match the
per-frame scan exactly — per-frame scores AND the committed cache — for
every cache policy, mask mode, fill state, ragged active prefixes, int8 KV
and non-divisible stream lengths.

Contract under test (engine.append_frames_fused / score_stream_fused +
ops/spec_decode.plan_compose(step=F)): one read-only verify pass over k*F
tokens reproduces k sequential production `decode_chunk(F)` frame appends
(the reference's per-frame scoring loop, `/root/reference/test/
inference.py:196-229`) while streaming the decoder weights once.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.config import aha_tiny
from aha_tpu.models import aha
from aha_tpu.ops.kv_cache import CachePolicy
from aha_tpu.streaming.engine import StreamEngine

B = 3
F = 5          # tokens per frame (engine takes embeds; F is shape-driven)


@pytest.fixture(scope="module")
def model():
    cfg = aha_tiny(vocab_size=128)
    params, cfg, _tok = aha.build_model_and_tokenizer(cfg, seed=0)
    return params, cfg


def _policy(kind, mask_mode="hf"):
    if kind == "none":
        return CachePolicy("none", window=512)
    if kind == "sink":
        # window small vs T*F so the fill transient AND steady eviction
        # both occur inside the stream
        return CachePolicy("sink", window=24, num_sink=4, mask_mode=mask_mode)
    return CachePolicy(kind, window=24, mask_mode=mask_mode)


def _engines(params, cfg, policy, k, kv_dtype=None):
    base = StreamEngine(params, cfg, policy, batch=B, kv_dtype=kv_dtype)
    fused = StreamEngine(params, cfg, policy, batch=B, kv_dtype=kv_dtype,
                         fused_score_frames=k)
    assert fused.fused_frames == k and base.fused_frames == 1
    return base, fused


def _frames(T, hidden, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, T, F, hidden)) * 0.1,
                       jnp.float32)


def _assert_cache_equal(a, b, policy, atol=1e-5):
    junk = policy.junk
    keepc = np.ones(policy.num_slots, bool)
    keepc[junk] = False
    np.testing.assert_array_equal(np.asarray(a.order)[:, keepc],
                                  np.asarray(b.order)[:, keepc])
    np.testing.assert_array_equal(np.asarray(a.key_pos)[:, keepc],
                                  np.asarray(b.key_pos)[:, keepc])
    np.testing.assert_array_equal(np.asarray(a.seen), np.asarray(b.seen))
    np.testing.assert_array_equal(np.asarray(a.length), np.asarray(b.length))
    occ = (np.asarray(b.order) >= 0) & keepc[None, :]
    quant = a.k_scale is not None
    for name, sname in (("k", "k_scale"), ("v", "v_scale")):
        # int8 caches compare DEQUANTIZED — the two paths quantize identical
        # f32 values through slightly different op orders, so raw codes can
        # differ by +-1 (same convention as tests/test_spec_decode.py)
        xa = np.asarray(getattr(a, name), np.float32)
        xb = np.asarray(getattr(b, name), np.float32)
        if quant:
            xa = xa * np.asarray(getattr(a, sname))[..., None]
            xb = xb * np.asarray(getattr(b, sname))[..., None]
        sel = occ[None, :, :, None, None]  # [L, B, W+1, KVH, Dh]
        np.testing.assert_allclose(np.where(sel, xa, 0.0),
                                   np.where(sel, xb, 0.0),
                                   rtol=2e-4, atol=atol)


@pytest.mark.parametrize("kind,mask_mode", [
    ("none", "hf"),
    ("sliding", "hf"),
    ("sliding", "strict"),
    ("sink", "hf"),
    ("sink", "strict"),
    ("static", "hf"),
])
def test_fused_scores_match_per_frame_scan(model, kind, mask_mode):
    """T=13 frames, k=4 (non-divisor -> padded tail), stream crosses the
    window fill boundary for the evicting policies."""
    params, cfg = model
    policy = _policy(kind, mask_mode)
    base, fused = _engines(params, cfg, policy, k=4)
    frames = _frames(13, cfg.llm.hidden_size)

    c0, s0 = base.score_stream(base.new_cache(), frames)
    c1, s1 = fused.score_stream(fused.new_cache(), frames)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-6)
    _assert_cache_equal(c1, c0, policy)


def test_fused_scores_match_per_frame_scan_w8a8(model):
    """Under the --w8a8 serving mode the fused pass quantizes k*F activation
    rows per qlinear where the per-frame loop quantizes F; the per-token
    activation scales make qlinear_w8a8 grouping-invariant
    (test_quant.py::test_w8a8_grouping_invariant), so fused == per-frame up
    to f32 reduction-order noise in the attention shapes."""
    from aha_tpu.ops import quant

    params, cfg = model
    qparams = quant.quantize_params(params)
    policy = _policy("sink")
    old = quant._FORCE_BACKEND
    quant._FORCE_BACKEND = "w8a8"
    try:
        base, fused = _engines(qparams, cfg, policy, k=4)
        frames = _frames(13, cfg.llm.hidden_size)
        c0, s0 = base.score_stream(base.new_cache(), frames)
        c1, s1 = fused.score_stream(fused.new_cache(), frames)
    finally:
        quant._FORCE_BACKEND = old
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-4, atol=1e-5)
    _assert_cache_equal(c1, c0, policy, atol=1e-4)


def test_fused_scores_after_text_prefix(model):
    """A query prefix leaves cache.length not frame-aligned — the fused
    plans must compose from an arbitrary mid-stream state (the reference
    interleaves user turns with frames, test/inference.py:283-334)."""
    params, cfg = model
    policy = _policy("sink")
    base, fused = _engines(params, cfg, policy, k=3)
    ids = [[5, 7, 11, 13], [2, 3], [17, 19, 23, 29, 31]]
    frames = _frames(7, cfg.llm.hidden_size, seed=1)

    c0, _ = base.append_ids(base.new_cache(), ids)
    c0, s0 = base.score_stream(c0, frames)
    c1, _ = fused.append_ids(fused.new_cache(), ids)
    c1, s1 = fused.score_stream(c1, frames)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-5, atol=1e-6)
    _assert_cache_equal(c1, c0, policy)


def test_fused_scores_ragged_active_prefix(model):
    """Ragged multi-stream batches: per-row prefix active masks (rows end
    at different frames) must score identically and leave finished rows'
    caches untouched."""
    params, cfg = model
    policy = _policy("sink")
    base, fused = _engines(params, cfg, policy, k=4)
    T = 11
    lengths = np.asarray([11, 4, 7])
    active = jnp.asarray(np.arange(T)[None, :] < lengths[:, None])
    frames = _frames(T, cfg.llm.hidden_size, seed=2)

    c0, s0 = base.score_stream(base.new_cache(), frames, active)
    c1, s1 = fused.score_stream(fused.new_cache(), frames, active)
    a = np.asarray(active)
    np.testing.assert_allclose(np.asarray(s1)[a], np.asarray(s0)[a],
                               rtol=1e-5, atol=1e-6)
    _assert_cache_equal(c1, c0, policy)


def test_fused_scores_int8_kv(model):
    """int8 KV cache: commit quantizes the in-flight block exactly like
    write_layer; scores must match the per-frame int8 path."""
    params, cfg = model
    policy = _policy("sink")
    base, fused = _engines(params, cfg, policy, k=4, kv_dtype=jnp.int8)
    frames = _frames(9, cfg.llm.hidden_size, seed=3)

    c0, s0 = base.score_stream(base.new_cache(), frames)
    c1, s1 = fused.score_stream(fused.new_cache(), frames)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=2e-4, atol=2e-5)
    _assert_cache_equal(c1, c0, policy, atol=2e-2)


def _trigger_engines(params, cfg, k):
    policy = _policy("sink")
    base = StreamEngine(params, cfg, policy)
    fused = StreamEngine(params, cfg, policy, fused_score_frames=k)
    return base, fused


HEADS = ("informative_score", "relevance_score")


def test_fused_trigger_loop_matches_sequential(model):
    """score_until_trigger fused vs per-frame: identical (scores,
    n_processed, score_sum, triggered, cache) across a sweep of prob/sum
    thresholds placed at the sequential run's own score levels — so
    triggers land mid-chunk, at chunk edges, and not at all — plus
    resume_at suppression and a non-multiple-of-k n_frames."""
    params, cfg = model
    base, fused = _trigger_engines(params, cfg, k=4)
    T = 13
    frames = _frames(T, cfg.llm.hidden_size, seed=5)[0]       # [T, F, H]

    # reference trace to place thresholds
    c, s_all = base.score_stream(base.new_cache(), frames[None])
    se = np.asarray(s_all[0, :, 0] + s_all[0, :, 1], np.float64)
    cums = np.cumsum(se)

    cases = [dict(prob_threshold=float(np.quantile(se, q)),
                  sum_threshold=None) for q in (0.15, 0.5, 0.85)]
    cases += [dict(prob_threshold=None, sum_threshold=float(c - 1e-6))
              for c in (cums[0], cums[5], cums[9], cums[-1] + 1.0)]
    cases += [dict(prob_threshold=float(np.quantile(se, 0.15)),
                   sum_threshold=None, resume_at=6)]

    for case in cases:
        r0 = base.score_until_trigger(
            base.new_cache(), frames, T, 0.0,
            case.get("prob_threshold"), case.get("sum_threshold"), HEADS,
            resume_at=case.get("resume_at", 0))
        r1 = fused.score_until_trigger(
            fused.new_cache(), frames, T, 0.0,
            case.get("prob_threshold"), case.get("sum_threshold"), HEADS,
            resume_at=case.get("resume_at", 0))
        c0, sb0, n0, sum0, trig0 = r0
        c1, sb1, n1, sum1, trig1 = r1
        assert int(n1) == int(n0), case
        assert bool(trig1) == bool(trig0), case
        np.testing.assert_allclose(float(sum1), float(sum0),
                                   rtol=1e-5, atol=1e-6, err_msg=str(case))
        n = int(n0)
        np.testing.assert_allclose(np.asarray(sb1)[:n], np.asarray(sb0)[:n],
                                   rtol=1e-5, atol=1e-6, err_msg=str(case))
        _assert_cache_equal(c1, c0, base.policy)


def test_fused_trigger_loop_resume_after_trigger(model):
    """Triggered mid-chunk, then resumed on the remaining frames (the
    session's generate-then-continue pattern): the second fused call must
    keep matching the sequential loop from the committed state."""
    params, cfg = model
    base, fused = _trigger_engines(params, cfg, k=4)
    T = 11
    frames = _frames(T, cfg.llm.hidden_size, seed=6)[0]

    _, s_all = base.score_stream(base.new_cache(), frames[None])
    se = np.asarray(s_all[0, :, 0] + s_all[0, :, 1], np.float64)
    thr = float(se[5]) - 1e-6      # fires at frame 5 at the latest

    c0, _, n0, sum0, trig0 = base.score_until_trigger(
        base.new_cache(), frames, T, 0.0, thr, None, HEADS)
    c1, _, n1, sum1, trig1 = fused.score_until_trigger(
        fused.new_cache(), frames, T, 0.0, thr, None, HEADS)
    assert bool(trig0) and bool(trig1) and int(n0) == int(n1)
    n = int(n0)
    assert n <= 6

    rest = frames[n:]
    c0, sb0, m0, rsum0, rtrig0 = base.score_until_trigger(
        c0, rest, T - n, float(sum0), np.inf, None, HEADS)
    c1, sb1, m1, rsum1, rtrig1 = fused.score_until_trigger(
        c1, rest, T - n, float(sum1), np.inf, None, HEADS)
    assert int(m0) == T - n and int(m1) == T - n
    assert not bool(rtrig0) and not bool(rtrig1)
    np.testing.assert_allclose(np.asarray(sb1)[:T - n],
                               np.asarray(sb0)[:T - n],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(rsum1), float(rsum0),
                               rtol=1e-5, atol=1e-6)
    _assert_cache_equal(c1, c0, base.policy)


def _drive_trigger_multi(eng, frames, prob, sumt, zt, first_n=2):
    """Serving pattern: repeated score_until_trigger_multi invocations to
    completion (each exits when any row triggers or hits its limit).
    Returns (per-row {frame: scores}, per-row trigger-frame lists, cache,
    (z_hist, z_cnt), final sums)."""
    import jax

    B, T = frames.shape[:2]
    cache = eng.new_cache()
    start = np.zeros(B, np.int32)
    limit = np.full(B, T, np.int32)
    ssum = np.zeros(B, np.float32)
    zs = eng.new_z_state(6)
    traces = [dict() for _ in range(B)]
    events = [[] for _ in range(B)]
    for _ in range(8 * T):
        if not (start < limit).any():
            break
        cache, sb, i2, s2, trig, zh, zc = eng.score_until_trigger_multi(
            cache, frames, start, limit, ssum, prob, sumt, HEADS,
            z_threshold=zt, z_state=zs, first_n_frames=first_n)
        zs = (zh, zc)
        sbh, i2h, trigh, ssum = jax.device_get((sb, i2, trig, s2))
        sbh = np.asarray(sbh)
        i2h = np.asarray(i2h)
        for b in range(B):
            for t in range(int(start[b]), int(i2h[b])):
                traces[b][t] = sbh[b, t].copy()
            if np.asarray(trigh)[b]:
                events[b].append(int(i2h[b]))
        start = i2h.astype(np.int32)
        ssum = np.asarray(ssum, np.float32)
    return traces, events, cache, zs, ssum


def test_fused_trigger_multi_matches_sequential(model):
    """The BATCHED trigger loop at k=4 (engine._trigger_loop_fused — the
    serving path, ref workload `/root/reference/test/inference.py:857-908`)
    vs the per-frame loop, driven to completion through repeated
    invocations: identical per-row trigger events, score traces, running
    sums, z-state and cache. Rows carry distinct rules (prob / sum / z),
    so triggers land mid-chunk and at chunk edges, and the z window
    state must advance identically through fused chunks."""
    params, cfg = model
    policy = _policy("sink")
    base = StreamEngine(params, cfg, policy, batch=B)
    fused = StreamEngine(params, cfg, policy, batch=B, fused_score_frames=4)
    T = 14
    frames = _frames(T, cfg.llm.hidden_size, seed=11)

    # place thresholds from a reference trace so each row actually fires
    _, s_all = base.score_stream(base.new_cache(), frames)
    se = np.asarray(s_all[..., 0] + s_all[..., 1], np.float64)
    prob = np.array([float(np.quantile(se[0], 0.7)), np.inf, np.inf],
                    np.float32)
    sumt = np.array([np.inf, float(np.cumsum(se[1])[5]) - 1e-6, np.inf],
                    np.float32)
    zt = np.array([np.inf, np.inf, 0.8], np.float32)

    t0, e0, c0, z0, s0 = _drive_trigger_multi(base, frames, prob, sumt, zt)
    t1, e1, c1, z1, s1 = _drive_trigger_multi(fused, frames, prob, sumt, zt)

    assert e1 == e0, (e1, e0)
    assert any(e0), "fixture must exercise at least one trigger"
    for b in range(B):
        assert t1[b].keys() == t0[b].keys()
        for t in t1[b]:
            np.testing.assert_allclose(t1[b][t], t0[b][t],
                                       rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(s1, s0, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(z1[0]), np.asarray(z0[0]),
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(z1[1]), np.asarray(z0[1]))
    _assert_cache_equal(c1, c0, policy, atol=2e-2)


@pytest.mark.slow
@pytest.mark.parametrize("spec", [1, 4])
def test_fused_serve_step_matches_sequential(model, spec):
    """serve_step (the one-program serving iteration) with fused scoring
    k=4 vs per-frame k=1, at both tail widths (sequential / speculative):
    identical per-row score traces, trigger points and response tokens.
    Exercises the mixed loop's 3-way body (fused_score_pass /
    seq_pass / spec_tail)."""
    import jax

    params, cfg = model
    policy = _policy("sink")
    T = 12
    frames = _frames(T, cfg.llm.hidden_size, seed=7)
    probe = StreamEngine(params, cfg, policy, batch=B)
    _, s_all = probe.score_stream(probe.new_cache(), frames)
    se = np.asarray(s_all[..., 0] + s_all[..., 1], np.float64)
    # row 0 fires on prob mid-stream; row 1 fires on sum; row 2 never
    prob = np.array([float(np.quantile(se[0], 0.75)), np.inf, np.inf],
                    np.float32)
    sumt = np.array([np.inf, float(np.cumsum(se[1])[6]) - 1e-6, np.inf],
                    np.float32)
    gen_prompt = [9, 8, 7]

    def drive(k):
        eng = StreamEngine(params, cfg, policy, batch=B, max_new_tokens=5,
                           spec_tokens=spec, fused_score_frames=k)
        cache = eng.new_cache()
        i = np.zeros(B, np.int32)
        limit = np.full(B, T, np.int32)
        ssum = np.zeros(B, np.float32)
        counts = eng.new_rep_counts()
        zs = eng.new_z_state()
        traces = [dict() for _ in range(B)]
        events = [[] for _ in range(B)]
        resp = [[] for _ in range(B)]
        for _ in range(8 * T):
            if not (i < limit).any():
                break
            can_step = i < limit
            (cache, sb, i2, s2, trig, out_ids, out_len, counts, _lt,
             zh, zc) = eng.serve_step(
                cache, [[] for _ in range(B)], can_step, frames, i, limit,
                ssum, counts, prob, sumt, HEADS, gen_prompt,
                do_generate=True, z_state=zs)
            zs = (zh, zc)
            (sbh, i2h, trigh, ssum, oi, ol) = jax.device_get(
                (sb, i2, trig, s2, out_ids, out_len))
            sbh, i2h = np.asarray(sbh), np.asarray(i2h)
            for b in range(B):
                for t in range(int(i[b]), int(i2h[b])):
                    traces[b][t] = sbh[b, t].copy()
                if np.asarray(trigh)[b]:
                    events[b].append(int(i2h[b]))
                    n = int(np.asarray(ol)[b])
                    resp[b].append(list(np.asarray(oi)[b, :n]))
            i = i2h.astype(np.int32)
            ssum = np.asarray(ssum, np.float32)
        return traces, events, resp, cache

    t0, e0, r0, c0 = drive(1)
    t1, e1, r1, c1 = drive(4)
    assert e1 == e0, (e1, e0)
    assert any(e0), "fixture must exercise at least one trigger+response"
    assert r1 == r0, (r1, r0)
    for b in range(B):
        assert t1[b].keys() == t0[b].keys()
        for t in t1[b]:
            np.testing.assert_allclose(t1[b][t], t0[b][t],
                                       rtol=3e-4, atol=3e-5)
    _assert_cache_equal(c1, c0, policy, atol=2e-2)


def test_fused_then_generate_matches(model):
    """After fused scoring, generation from the committed cache must equal
    generation after the per-frame scan (the cache is the full state)."""
    params, cfg = model
    policy = _policy("sink")
    base, fused = _engines(params, cfg, policy, k=4)
    frames = _frames(8, cfg.llm.hidden_size, seed=4)
    prompt = [[9, 8, 7]] * B

    c0, _ = base.score_stream(base.new_cache(), frames)
    c1, _ = fused.score_stream(fused.new_cache(), frames)
    _, o0, n0, _, _ = base.generate(c0, prompt, base.new_rep_counts())
    _, o1, n1, _, _ = fused.generate(c1, prompt, fused.new_rep_counts())
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n0))
    for b in range(B):
        n = int(n0[b])
        np.testing.assert_array_equal(np.asarray(o1[b, :n]),
                                      np.asarray(o0[b, :n]))

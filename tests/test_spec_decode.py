"""Speculative decode: exact-sequential parity of the verify pass + commit.

The contract under test (ops/spec_decode.py, models/qwen2.decode_chunk_spec):
a speculative verify chunk of S tokens must be BIT-EQUAL to S sequential
1-token `decode_chunk` passes (the reference greedy loop,
`/root/reference/models/live_llava/modeling_live.py:64-90`), for EVERY
cache policy and fill state — the verify pass conds to the composed
rotate-at-read exact branch wherever the fast pre-rotation algebra
deviates (sink fill transient AND the permanent post-fill chunk/decode
position lag) — and committing m accepted tokens must leave the cache
identical to having run only m sequential passes.
"""



import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.config import qwen2_tiny
from aha_tpu.models import qwen2
from aha_tpu.ops.kv_cache import CachePolicy, init_cache
from aha_tpu.ops import spec_decode

S = 4
B = 2


def _policy(kind):
    if kind == "sink":
        return CachePolicy("sink", window=32, num_sink=4)
    if kind == "none":
        return CachePolicy("none", window=512)
    return CachePolicy(kind, window=32)


def _setup(kind, prefill, kv_dtype=jnp.float32, seed=0):
    cfg = qwen2_tiny(vocab_size=97)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(seed))
    policy = _policy(kind)
    rng = np.random.default_rng(seed)
    cache = init_cache(policy, num_layers=cfg.num_layers, batch=B,
                      num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
                      dtype=kv_dtype)
    left = prefill
    while left > 0:
        n = min(8, left)
        emb = jnp.asarray(rng.standard_normal((B, n, cfg.hidden_size)) * 0.1,
                          jnp.float32)
        _, cache = qwen2.decode_chunk(params, cfg, policy, cache, emb,
                                      jnp.full((B,), n, jnp.int32))
        left -= n
    embs = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)) * 0.1,
                       jnp.float32)
    return cfg, params, policy, cache, embs


def _sequential(cfg, params, policy, cache, embs, n_steps, valid_len=None):
    """n_steps 1-token production passes; rows beyond their valid_len are
    no-ops (valid 0)."""
    hs = []
    for j in range(n_steps):
        v = (jnp.ones((B,), jnp.int32) if valid_len is None
             else (valid_len > j).astype(jnp.int32))
        h, cache = qwen2.decode_chunk(params, cfg, policy, cache,
                                      embs[:, j:j + 1], v)
        hs.append(h)
    return (jnp.concatenate(hs, axis=1) if hs else None), cache


# smoke tier keeps one representative state per regime (pre-fill fast,
# post-fill exact, partial transition); the full sweep is slow-tier
_SMOKE = {("none", 8), ("sliding", 40), ("sink", 24), ("sink", 80),
          ("static", 8)}


@pytest.mark.parametrize("kind", ["none", "sliding", "sink", "static"])
@pytest.mark.parametrize("prefill", [0, 8, 24, 40, 64, 80])
def test_spec_verify_matches_sequential(kind, prefill, request):
    if kind == "none" and prefill > 40:
        pytest.skip("unbounded policy: large prefill adds nothing")
    if (kind, prefill) not in _SMOKE and not (
            request.config.getoption("--full", default=False)
            or __import__("os").environ.get("AHA_FULL_TESTS") == "1"):
        pytest.skip("slow tier (run with --full or AHA_FULL_TESTS=1)")
    cfg, params, policy, cache, embs = _setup(kind, prefill)
    valid = jnp.full((B,), S, jnp.int32)
    plans = spec_decode.plan_compose(cache, policy, valid, S)
    h_spec, infl_k, infl_v = qwen2.decode_chunk_spec(
        params, cfg, policy, cache, embs, plans)
    h_seq, cache_seq = _sequential(cfg, params, policy, cache, embs, S)
    np.testing.assert_allclose(np.asarray(h_spec), np.asarray(h_seq),
                               rtol=2e-5, atol=2e-5)

    # commit ALL S tokens -> identical cache (junk slot excluded: its
    # content is don't-care by construction)
    committed = spec_decode.commit_slots(cache, plans, infl_k, infl_v,
                                         jnp.full((B,), S, jnp.int32),
                                         policy.junk)
    committed = spec_decode.select_meta(committed, plans,
                                        jnp.full((B,), S, jnp.int32))
    _assert_cache_equal(committed, cache_seq, policy)


@pytest.mark.parametrize("kind", ["none", "sliding", "sink"])
@pytest.mark.parametrize("m", [0, 1, 3])
def test_spec_commit_prefix_matches_sequential(kind, m, request):
    if (kind, m) not in {("sink", 0), ("sink", 3), ("none", 1)} and not (
            request.config.getoption("--full", default=False)
            or __import__("os").environ.get("AHA_FULL_TESTS") == "1"):
        pytest.skip("slow tier (run with --full or AHA_FULL_TESTS=1)")
    """Committing m accepted tokens == running only m sequential passes."""
    # past-fill for evicting kinds (80 = steady state: the sink fill
    # transient lasts ~one window past fill, i.e. until ~2*W)
    prefill = 80 if kind != "none" else 8
    cfg, params, policy, cache, embs = _setup(kind, prefill)
    valid = jnp.full((B,), S, jnp.int32)
    plans = spec_decode.plan_compose(cache, policy, valid, S)
    _, infl_k, infl_v = qwen2.decode_chunk_spec(
        params, cfg, policy, cache, embs, plans)
    mc = jnp.full((B,), m, jnp.int32)
    committed = spec_decode.select_meta(
        spec_decode.commit_slots(cache, plans, infl_k, infl_v, mc,
                                 policy.junk), plans, mc)
    _, cache_seq = _sequential(cfg, params, policy, cache, embs, m)
    _assert_cache_equal(committed, cache_seq, policy)


def test_spec_ragged_valid_rows():
    """Per-row valid_len (carried token + differing draft counts): each
    row must behave like its own sequential run."""
    cfg, params, policy, cache, embs = _setup("sink", 80)
    valid = jnp.asarray([1, 3], jnp.int32)           # row 0: no drafts
    plans = spec_decode.plan_compose(cache, policy, valid, S)
    h_spec, infl_k, infl_v = qwen2.decode_chunk_spec(
        params, cfg, policy, cache, embs, plans)
    h_seq, cache_seq = _sequential(cfg, params, policy, cache, embs, S,
                                   valid_len=valid)
    for b in range(B):
        n = int(valid[b])
        np.testing.assert_allclose(np.asarray(h_spec)[b, :n],
                                   np.asarray(h_seq)[b, :n],
                                   rtol=2e-5, atol=2e-5)
    committed = spec_decode.select_meta(
        spec_decode.commit_slots(cache, plans, infl_k, infl_v, valid,
                                 policy.junk), plans, valid)
    _assert_cache_equal(committed, cache_seq, policy)


def test_spec_int8_kv_commit():
    """int8 KV cache: verify pass reads quantized cache; commit quantizes
    the in-flight block exactly like write_layer."""
    cfg, params, policy, cache, embs = _setup("sink", 80, kv_dtype=jnp.int8)
    valid = jnp.full((B,), S, jnp.int32)
    plans = spec_decode.plan_compose(cache, policy, valid, S)
    h_spec, infl_k, infl_v = qwen2.decode_chunk_spec(
        params, cfg, policy, cache, embs, plans)
    h_seq, cache_seq = _sequential(cfg, params, policy, cache, embs, S)
    np.testing.assert_allclose(np.asarray(h_spec), np.asarray(h_seq),
                               rtol=5e-3, atol=5e-3)
    mc = jnp.full((B,), S, jnp.int32)
    committed = spec_decode.select_meta(
        spec_decode.commit_slots(cache, plans, infl_k, infl_v, mc,
                                 policy.junk), plans, mc)
    _assert_cache_equal(committed, cache_seq, policy, atol=2e-2)


def test_exact_branch_gate():
    """plans.exact must be False while no eviction has happened (the fast
    path is exact there) and True once the chunk/decode position lag makes
    the fast algebra wrong — which, with 8-token prefill chunks followed by
    1-token decode steps, is EVERY post-fill state (the lag is permanent,
    not a transient: BASELINE.md round 3)."""
    cfg, params, policy, cache, embs = _setup("sink", 0)
    valid = jnp.full((B,), S, jnp.int32)
    flags = {}
    for prefill in (0, 8, 24, 28, 32, 40, 64, 80):
        _, _, _, cache, _ = _setup("sink", prefill)
        plans = spec_decode.plan_compose(cache, policy, valid, S)
        flags[prefill] = bool(plans.exact)
    assert not flags[0] and not flags[8] and not flags[24], flags
    assert all(flags[p] for p in (32, 40, 64, 80)), flags


def _assert_cache_equal(a, b, policy, atol=2e-5):
    junk = policy.junk
    W1 = policy.num_slots
    keep = np.ones(W1, bool)
    keep[junk] = False
    np.testing.assert_array_equal(np.asarray(a.order)[:, keep],
                                  np.asarray(b.order)[:, keep])
    np.testing.assert_array_equal(np.asarray(a.key_pos)[:, keep],
                                  np.asarray(b.key_pos)[:, keep])
    np.testing.assert_array_equal(np.asarray(a.seen), np.asarray(b.seen))
    np.testing.assert_array_equal(np.asarray(a.length), np.asarray(b.length))
    occ = (np.asarray(a.order) >= 0) & keep[None, :]     # [B, W+1]
    quant = a.k_scale is not None
    for name, sname in (("k", "k_scale"), ("v", "v_scale")):
        # compare only occupied, non-junk slots; int8 caches compare
        # DEQUANTIZED (the two paths quantize identical f32 values through
        # slightly different op orders, so raw codes can differ by +-1)
        xa = np.asarray(getattr(a, name), np.float32)
        xb = np.asarray(getattr(b, name), np.float32)
        if quant:
            xa = xa * np.asarray(getattr(a, sname))[..., None]
            xb = xb * np.asarray(getattr(b, sname))[..., None]
        sel = occ[None, :, :, None, None]
        np.testing.assert_allclose(np.where(sel, xa, 0.0),
                                   np.where(sel, xb, 0.0),
                                   rtol=2e-4, atol=atol)

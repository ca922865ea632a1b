"""int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.config import aha_tiny
from aha_tpu.models import aha, qwen2
from aha_tpu.ops import quant
from aha_tpu.ops.kv_cache import CachePolicy
from aha_tpu.streaming.engine import StreamEngine


def test_quantize_array_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 32, 16)).astype(np.float32))
    q = quant.quantize_array(w, contract_axis=1)
    assert q["qvalue"].dtype == jnp.int8
    assert q["scale"].shape == (4, 1, 16)
    deq = quant.dequantize(q, jnp.float32)
    err = np.abs(np.asarray(deq - w)).max()
    scale_max = float(q["scale"].max())
    assert err <= scale_max * 0.51  # quantization step/2 + rounding


@pytest.mark.slow
def test_quantized_model_close_to_dense():
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    qparams = quant.quantize_params(params)
    assert quant.tree_nbytes(qparams) < 0.55 * quant.tree_nbytes(params)
    # norms/heads untouched
    assert not isinstance(qparams["heads"]["relevance"]["kernel"], dict)
    assert isinstance(qparams["llm"]["layers"]["q_proj"]["kernel"], dict)

    ids = jnp.asarray(np.random.default_rng(1).integers(0, 100, (1, 12)))
    emb_d = qwen2.embed_tokens(params["llm"], ids)
    emb_q = qwen2.embed_tokens(qparams["llm"], ids, dtype=jnp.float32)
    h_d = qwen2.forward_hidden(params["llm"], cfg.llm, emb_d)
    h_q = qwen2.forward_hidden(qparams["llm"], cfg.llm, emb_q)
    # int8 noise compounds through layers: check correlation, not exactness
    a, b = np.asarray(h_d).ravel(), np.asarray(h_q).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.98, cos


def test_quantize_vision_tower():
    """--vision_int8 wiring: quantize_vision=True quantizes the SigLIP
    tower (default leaves it dense — it is compute-bound, quant.py
    docstring); visual_embed stays close to dense, and the
    keep_dense=('llm',) combination (vision-only quantization) leaves
    the trunk untouched."""
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)

    q_default = quant.quantize_params(params)
    assert not isinstance(
        q_default["vision"]["layers"]["fc1"]["kernel"], dict)

    q_vis = quant.quantize_params(params, quantize_vision=True,
                                  keep_dense=("llm",))
    assert isinstance(q_vis["vision"]["layers"]["fc1"]["kernel"], dict)
    assert not isinstance(q_vis["llm"]["layers"]["q_proj"]["kernel"], dict)

    frames = jnp.asarray(
        np.random.default_rng(2).integers(
            0, 255, (3, cfg.frame_resolution, cfg.frame_resolution, 3),
            dtype=np.uint8))
    e_d = np.asarray(aha.visual_embed(params, cfg, frames), np.float64)
    e_q = np.asarray(aha.visual_embed(q_vis, cfg, frames), np.float64)
    a, b = e_d.ravel(), e_q.ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.98, cos


def test_quantized_streaming_engine_runs():
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    qparams = quant.quantize_params(params)
    engine = StreamEngine(qparams, cfg, CachePolicy(kind="sink", window=32, num_sink=4))
    cache = engine.new_cache(dtype=jnp.float32)
    r = cfg.frame_resolution
    frames = np.random.default_rng(0).integers(0, 255, (3, r, r, 3), dtype=np.uint8)
    embeds = engine.encode_frames(frames)
    cache, scores = engine.append_frames(cache, embeds[0][None])
    assert np.isfinite(np.asarray(scores)).all()
    cache, out_ids, out_len, _, _ = engine.generate(
        cache, [tok.apply_chat_template([{"role": "system", "content": "s"}])],
        engine.new_rep_counts(),
    )
    assert int(out_len[0]) >= 1


def test_pallas_quant_matmul_matches_jnp():
    import os

    from aha_tpu.ops.pallas.quant_matmul import quant_matmul

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 7, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 160)).astype(np.float32))
    q = quant.quantize_array(w, contract_axis=0)
    want = np.asarray(jnp.einsum("...i,io->...o", x, quant.dequantize(q, jnp.float32)))
    got = np.asarray(quant_matmul(x, q["qvalue"], q["scale"]))
    # kernel computes in bf16 (the TPU compute dtype); bound the error
    # relative to the output scale rather than per element
    assert np.abs(got - want).max() <= 0.02 * np.abs(want).max()


def test_qlinear_dispatch_modes(monkeypatch):
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    q = quant.quantize_array(w, contract_axis=0)
    monkeypatch.setenv("AHA_QUANT_MATMUL", "jnp")
    a = quant.qlinear(x, q)
    monkeypatch.setenv("AHA_QUANT_MATMUL", "pallas")
    b = quant.qlinear(x, q)
    a, b = np.asarray(a), np.asarray(b)
    assert np.abs(a - b).max() <= 0.02 * np.abs(a).max()


def test_w8a8_accuracy(monkeypatch):
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    qparams = quant.quantize_params(params)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 100, (1, 16)))
    emb = qwen2.embed_tokens(qparams["llm"], ids, dtype=jnp.float32)

    monkeypatch.setenv("AHA_QUANT_MATMUL", "jnp")
    h_ref = qwen2.forward_hidden(qparams["llm"], cfg.llm, emb)
    monkeypatch.setenv("AHA_QUANT_MATMUL", "w8a8")
    h_w8a8 = qwen2.forward_hidden(qparams["llm"], cfg.llm, emb)

    a = np.asarray(h_ref).ravel()
    b = np.asarray(h_w8a8).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.97, cos


def test_w8a8_grouping_invariant():
    """qlinear_w8a8 quantizes activations PER TOKEN (per row), so splitting
    a batch of rows into any chunking produces bit-identical outputs — the
    property that makes the fused k-frame verify pass (which quantizes
    k*F rows at once where the per-frame loop quantizes F) numerically
    equivalent to the sequential loop under the --w8a8 serving mode."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(24, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    q = quant.quantize_array(w, contract_axis=0)
    whole = np.asarray(quant.qlinear_w8a8(x, q))
    for split in (1, 4, 8):
        parts = [np.asarray(quant.qlinear_w8a8(x[i:i + split], q))
                 for i in range(0, x.shape[0], split)]
        np.testing.assert_array_equal(np.concatenate(parts, axis=0), whole)


@pytest.mark.slow
def test_int4_roundtrip_and_accuracy():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))
    q4 = quant.quantize_array_int4(w, contract_axis=1, group=32)
    assert q4["q4value"].shape == (2, 32, 32) and q4["q4value"].dtype == jnp.uint8
    deq = quant.dequantize_int4(q4, jnp.float32)
    assert deq.shape == w.shape
    err = np.abs(np.asarray(deq - w))
    # int4 step = scale; max error <= scale/2 per group
    assert err.max() <= float(q4["scale4"].astype(jnp.float32).max()) * 0.51

    # full model: int4 forward still correlates with dense
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    q4params = quant.quantize_params(params, bits=4)
    assert quant.tree_nbytes(q4params) < quant.tree_nbytes(
        quant.quantize_params(params))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 100, (1, 12)))
    h_d = qwen2.forward_hidden(params["llm"], cfg.llm,
                               qwen2.embed_tokens(params["llm"], ids))
    h_q = qwen2.forward_hidden(q4params["llm"], cfg.llm,
                               qwen2.embed_tokens(q4params["llm"], ids, dtype=jnp.float32))
    a, b = np.asarray(h_d).ravel(), np.asarray(h_q).ravel()
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.95, cos


def test_int4_streaming_engine_runs():
    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    q4params = quant.quantize_params(params, bits=4)
    engine = StreamEngine(q4params, cfg, CachePolicy(kind="sink", window=32, num_sink=4))
    cache = engine.new_cache(dtype=jnp.float32)
    r = cfg.frame_resolution
    frames = np.random.default_rng(0).integers(0, 255, (2, r, r, 3), dtype=np.uint8)
    embeds = engine.encode_frames(frames)
    cache, scores = engine.append_frames(cache, embeds[0][None])
    assert np.isfinite(np.asarray(scores)).all()


@pytest.mark.slow  # engine-internal parity (~8 s); the quantized-engine
# smoke tests above exercise the merged path end-to-end
def test_merged_projections_match_unmerged():
    """merge_decoder_projections (qkv / gate_up fusion for fewer kernel
    calls) must leave decode_chunk outputs unchanged — incl. LoRA deltas
    applied on the output slices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aha_tpu.config import qwen2_tiny
    from aha_tpu.models import qwen2
    from aha_tpu.ops import quant
    from aha_tpu.ops.kv_cache import CachePolicy, init_cache
    from aha_tpu.train import lora as lora_lib
    from aha_tpu.config import LoraConfig

    cfg = qwen2_tiny(vocab_size=128)
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quant.quantize_params({"llm": params})["llm"]
    merged = quant.merge_decoder_projections(qparams)
    lora = lora_lib.init_lora(cfg, LoraConfig(r=4), jax.random.PRNGKey(3))
    # non-zero B so lora actually contributes
    lora = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.ndim == 3 else a, lora)

    rng = np.random.default_rng(0)
    embeds = jnp.asarray(rng.standard_normal((1, 12, cfg.hidden_size)), jnp.float32)
    policy = CachePolicy("none", window=32)

    outs = []
    for p in (qparams, merged):
        cache = init_cache(policy, num_layers=cfg.num_layers, batch=1,
                           num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
                           dtype=jnp.float32)
        h, _ = qwen2.decode_chunk(p, cfg, policy, cache, embeds,
                                  jnp.asarray([12], jnp.int32),
                                  lora=lora, lora_scale=0.5)
        outs.append(np.asarray(h))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)


def test_param_specs_shard_quantized_kernels():
    """Quantized kernel dicts inherit the dense kernel's sharding rule
    (qvalue = full spec; scales keep only the axes that still divide)."""
    from jax.sharding import PartitionSpec as P

    from aha_tpu.parallel import mesh as mesh_lib

    cfg = aha_tiny(vocab_size=128)
    params, cfg, _ = aha.build_model_and_tokenizer(cfg, seed=0)
    qparams = quant.quantize_params(params, keep_dense=("projector", "lm_head"))
    mesh = mesh_lib.make_mesh(2, 2, devices=jax.devices()[:4])
    specs = mesh_lib.param_specs(qparams, mesh)
    q_proj = specs["llm"]["layers"]["q_proj"]["kernel"]
    dims = dict(zip(("L", "in", "out"),
                    params["llm"]["layers"]["q_proj"]["kernel"].shape))
    want_in = "data" if dims["in"] % 2 == 0 else None
    want_out = "model" if dims["out"] % 2 == 0 else None
    assert tuple(q_proj["qvalue"]) == (None, want_in, want_out)
    # scale is [L, 1, out]: the contracted axis can never shard
    assert tuple(q_proj["scale"]) == (None, None, want_out)
    # a sharded dequant forward still runs and matches the unsharded one
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 4, cfg.llm.hidden_size)).astype(np.float32))
    h0 = qwen2.forward_hidden(qparams["llm"], cfg.llm, x)
    sharded = mesh_lib.apply_named_sharding(qparams["llm"], mesh,
                                            specs=specs["llm"])
    h1 = qwen2.forward_hidden(sharded, cfg.llm, x)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               rtol=2e-4, atol=2e-5)

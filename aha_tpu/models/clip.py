"""CLIP-style ViT vision tower (the reference's second tower option).

Mirrors `_clip_vision_encode` + `build_live_vision`
(`/root/reference/models/vision_live.py:34-64`): OpenAI-CLIP normalization,
a CLS token prepended to the patch grid, pre-LN before the transformer,
quick-gelu MLPs, and **no** post-layernorm on the token stream (the
reference pools `last_hidden_state[:, 1:]` and takes
`last_hidden_state[:, 0]` as the CLS feature, both un-normalized).

Shapes follow `laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90k` /
`openai/clip-vit-large-patch14-336` (the two checkpoints the reference
factory accepts): patch conv has no bias, q/k/v/out and fc1/fc2 all biased.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aha_tpu.config import SiglipConfig

# transformers.utils.constants OPENAI_CLIP_MEAN / OPENAI_CLIP_STD
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def init_params(cfg: SiglipConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 16))

    def dense(kk, shape):
        return (0.02 * jax.random.normal(kk, shape)).astype(dtype)

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size
    return {
        "cls_embed": dense(next(ks), (H,)),
        "patch_embed": {"kernel": dense(next(ks), (P, P, 3, H))},  # HWIO, no bias
        "pos_embed": dense(next(ks), (cfg.num_patches + 1, H)),
        "pre_ln": {"scale": jnp.ones((H,), dtype), "bias": jnp.zeros((H,), dtype)},
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
    }


def preprocess_frames(frames: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8/float [N, H, W, 3] -> OpenAI-CLIP-normalized pixels
    ((x/255 - mean) / std, ref vision_live.py:35)."""
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    x = frames.astype(jnp.float32) * (1.0 / 255.0)
    return ((x - mean) / std).astype(dtype)


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


def forward(params: dict, cfg: SiglipConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: normalized [N, H, W, 3] -> tokens [N, 1 + num_patches, H]
    (CLS first; NOT post-layernormed — matches HF last_hidden_state which is
    what the reference slices)."""
    from aha_tpu.models.siglip import _mha, layer_norm, _dense

    x = jax.lax.conv_general_dilated(
        pixels,
        params["patch_embed"]["kernel"].astype(pixels.dtype),
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    N = x.shape[0]
    x = x.reshape(N, cfg.num_patches, cfg.hidden_size)
    cls_tok = jnp.broadcast_to(
        params["cls_embed"].astype(x.dtype)[None, None, :], (N, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    x = layer_norm(x, params["pre_ln"], cfg.layer_norm_eps)

    def layer_fn(x, lp):
        h = layer_norm(x, lp["ln1"], cfg.layer_norm_eps)
        x = x + _mha(h, lp, cfg.num_heads)
        h = layer_norm(x, lp["ln2"], cfg.layer_norm_eps)
        h = _dense(h, lp["fc1"])
        h = _quick_gelu(h)
        x = x + _dense(h, lp["fc2"])
        return x, None

    x, _ = jax.lax.scan(layer_fn, x, params["layers"])
    return x

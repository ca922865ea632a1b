"""Rotary position embeddings (llama/qwen convention).

The decoder stores *unrotated* keys in the KV cache and rotates at attention
time by each slot's recorded position (see ops/kv_cache.py). This turns the
reference's eviction-time key re-rotation (`/root/reference/test/sink_cache.py:35-55,140-152`)
into plain position bookkeeping: a "re-rotated" key is just a key whose
recorded position changed.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float, dtype=jnp.float32):
    """cos/sin tables for given integer positions.

    positions: int array [...]; returns cos, sin of shape [..., head_dim]
    (frequencies duplicated across both halves, HF llama convention).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate x [..., S, H, D] by cos/sin [..., S, D] (broadcast over heads)."""
    cos = cos[..., :, None, :]
    sin = sin[..., :, None, :]
    return (x * cos + rotate_half(x) * sin).astype(x.dtype)


def rotate_by_positions(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotate x [..., S, H, D] by integer positions [..., S]."""
    cos, sin = rope_cos_sin(positions, x.shape[-1], theta, dtype=jnp.float32)
    return apply_rope(x.astype(jnp.float32), cos, sin).astype(x.dtype)

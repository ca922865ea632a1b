"""Rotary position embeddings (llama/qwen convention).

The decoder stores keys in the KV cache *pre-rotated at their write
position* (absolute stream index `g` under the sink policy, insert
position otherwise — see ops/kv_cache.py and ops/attention.py). The
reference's eviction-time key re-rotation
(`/root/reference/test/sink_cache.py:35-55,140-152`) reduces to a 32-slot
sink-column score correction: for ring slots the RoPE-relative distance
`q_pos - key_pos` equals the absolute token age `g_q - g_k` except during
the transient after a partial first eviction event, where
cached_attention switches to exact rotate-at-read (see its docstring),
so pre-rotated keys need no per-chunk touch-up on the steady path.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# Positions are split pos = hi * _POS_SPLIT + lo before multiplying by the
# inverse frequencies: absolute stream positions grow unboundedly under the
# pre-rotated-key scheme (an hour-long 1 fps stream is ~185k tokens) and
# `pos * inv_freq` in f32 would lose ~1e-2 rad of angle at pos ~2e5. With
# the split, `hi * ((SPLIT * inv_freq) mod 2pi)` stays small (the table is
# folded in f64 at trace time) and `lo * inv_freq` is near-exact. For
# pos < _POS_SPLIT (all parity tests, any bounded-position policy) hi = 0
# and the result is bit-identical to the naive product.
_POS_SPLIT = 8192


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float, dtype=jnp.float32):
    """cos/sin tables for given integer positions.

    positions: int array [...]; returns cos, sin of shape [..., head_dim]
    (frequencies duplicated across both halves, HF llama convention).
    """
    half = head_dim // 2
    inv_freq_64 = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) / half))
    inv_freq = jnp.asarray(inv_freq_64, jnp.float32)
    # (SPLIT * inv_freq) mod 2pi, folded in f64 on host (static constant)
    hi_freq = jnp.asarray(np.mod(_POS_SPLIT * inv_freq_64, 2 * np.pi), jnp.float32)
    pos = positions[..., None]
    hi = (pos // _POS_SPLIT).astype(jnp.float32)
    lo = (pos % _POS_SPLIT).astype(jnp.float32)
    freqs = hi * hi_freq + lo * inv_freq                          # [..., half]
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

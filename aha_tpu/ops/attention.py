"""Attention: cached streaming step (GQA over the ring-buffer cache) and
full-sequence causal attention for training/prefill.

The streaming path replaces the reference's HF attention + dynamic cache
(`/root/reference/test/inference.py:196-229` driving transformers Qwen2
attention). Keys live unrotated in the cache and are rotated here by their
per-slot ``key_pos`` — this is where sink-cache "re-rotation" becomes free.

A reference jnp implementation is the default; Pallas kernels (ops/pallas/*)
are drop-in replacements validated against it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .kv_cache import UpdatePlan, attention_slot_mask
from .rope import rotate_by_positions

NEG_INF = -1e30


def cached_attention(
    q: jnp.ndarray,        # [B, S, NH, Dh] (unrotated)
    k_cache: jnp.ndarray,  # [B, W+1, KVH, Dh] (unrotated, chunk already written)
    v_cache: jnp.ndarray,  # [B, W+1, KVH, Dh]
    key_pos: jnp.ndarray,  # [B, W+1]
    plan: UpdatePlan,
    *,
    rope_theta: float,
) -> jnp.ndarray:
    """One chunk of streaming attention against the cache. Returns [B, S, NH, Dh]."""
    B, S, NH, Dh = q.shape
    KVH = k_cache.shape[2]
    n_rep = NH // KVH

    q_rot = rotate_by_positions(q, plan.q_pos, rope_theta)
    k_rot = rotate_by_positions(k_cache, key_pos, rope_theta)

    # GQA without materializing repeated K/V: group the query heads
    # [B, S, KVH, n_rep, Dh] against the shared [B, W+1, KVH, Dh]
    qg = q_rot.reshape(B, S, KVH, n_rep, Dh)
    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
    scores = jnp.einsum(
        "bsgrd,bwgd->bgrsw", qg.astype(jnp.float32), k_rot.astype(jnp.float32)
    ) * scale                                             # [B, KVH, rep, S, W+1]

    mask = attention_slot_mask(plan)[:, None, None, :, :]  # [B, 1, 1, S, W+1]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrsw,bwgd->bsgrd", probs.astype(v_cache.dtype), v_cache)
    return out.reshape(B, S, NH, Dh).astype(q.dtype)


def causal_attention(
    q: jnp.ndarray,  # [B, T, NH, Dh] (unrotated)
    k: jnp.ndarray,  # [B, T, KVH, Dh]
    v: jnp.ndarray,  # [B, T, KVH, Dh]
    *,
    rope_theta: float,
    positions: jnp.ndarray | None = None,   # [B, T]; defaults to arange
    attn_mask: jnp.ndarray | None = None,   # [B, T] bool, False = padding
) -> jnp.ndarray:
    """Full-sequence causal attention for training and prefill."""
    B, T, NH, Dh = q.shape
    KVH = k.shape[2]
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))

    q = rotate_by_positions(q, positions, rope_theta)
    k = rotate_by_positions(k, positions, rope_theta)
    n_rep = NH // KVH
    qg = q.reshape(B, T, KVH, n_rep, Dh)

    scale = 1.0 / jnp.sqrt(jnp.asarray(Dh, jnp.float32))
    scores = jnp.einsum(
        "bsgrd,btgd->bgrst", qg.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale                                             # [B, KVH, rep, T, T]

    causal = jnp.tril(jnp.ones((T, T), bool))[None, None, None]
    mask = causal
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrst,btgd->bsgrd", probs.astype(v.dtype), v)
    return out.reshape(B, T, NH, Dh).astype(q.dtype)

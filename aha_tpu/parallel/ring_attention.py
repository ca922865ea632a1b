"""Ring attention: causal attention over a sequence sharded across mesh
devices.

The reference handles long contexts only algorithmically (bounded KV
windows, `/root/reference/test/sink_cache.py` et al.); SURVEY §5 calls for
the TPU-native scaling path the framework should provide: shard the
sequence over a mesh axis, keep the O(T^2) score matrix blockwise, and
rotate K/V shards around the ring with `lax.ppermute` while accumulating
flash-style online softmax (m, l, acc) — compute overlaps the ICI transfer
and no device ever materializes more than its [T/p x T/p] block.

Usage: inside `shard_map` over a mesh axis (see `ring_causal_attention`
for a ready-made wrapper), or compose `_ring_attention_shard` directly in
a larger sharded forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attn_update(q, k_blk, v_blk, m, l, acc, q_pos, k_pos, scale,
                       k_valid=None):
    """One flash-attention block update with causal masking on global
    positions. Shapes: q [B,Tq,H,D], k/v [B,Tk,H,D], m/l [B,H,Tq],
    acc [B,Tq,H,D]; q_pos/k_pos [Tq]/[Tk] or [B,Tq]/[B,Tk];
    k_valid [B,Tk] bool (padding keys masked out)."""
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k_blk.astype(jnp.float32)) * scale
    if q_pos.ndim == 1:
        mask = (q_pos[:, None] >= k_pos[None, :])[None]    # [1, Tq, Tk]
    else:
        mask = q_pos[:, :, None] >= k_pos[:, None, :]      # [B, Tq, Tk]
    if k_valid is not None:
        mask = mask & k_valid[:, None, :]
    scores = jnp.where(mask[:, None], scores, NEG_INF)

    m_blk = scores.max(axis=-1)                            # [B,H,Tq]
    m_new = jnp.maximum(m, m_blk)
    # guard fully-masked rows (m_new == NEG_INF): exp(NEG_INF - NEG_INF)=1
    # would pollute l; clamp the correction to 0 instead
    row_any = m_new > NEG_INF / 2
    alpha = jnp.where(row_any, jnp.exp(m - m_new), 0.0)    # rescale old acc
    p = jnp.exp(scores - m_new[..., None])
    p = jnp.where(row_any[..., None], p, 0.0)
    l_new = l * alpha + p.sum(axis=-1)
    acc_new = acc * alpha.transpose(0, 2, 1)[..., None] + jnp.einsum(
        "bhqk,bkhd->bqhd", p, v_blk.astype(jnp.float32))
    return m_new, l_new, acc_new


def _ring_attention_shard(q, k, v, q_pos, k_valid, *, axis_name: str,
                          scale: float):
    """Per-shard body: q/k/v [B, T_local, H, D] (already RoPE-rotated);
    q_pos [B, T_local] int32 (this shard's query positions — also used as
    key positions when its block visits other shards); k_valid [B, T_local]
    bool. Positions and validity rotate around the ring with their K/V
    block, so left-padded rows mask correctly."""
    p = jax.lax.psum(1, axis_name)
    B, Tl, H, D = q.shape

    # accumulators start device-varying (they will depend on axis_index)
    vary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    m = vary(jnp.full((B, H, Tl), NEG_INF, jnp.float32))
    l = vary(jnp.zeros((B, H, Tl), jnp.float32))
    acc = vary(jnp.zeros((B, Tl, H, D), jnp.float32))
    perm = [(i, (i + 1) % p) for i in range(p)]

    def body(i, carry):
        k_blk, v_blk, k_pos_blk, k_valid_blk, m, l, acc = carry
        m, l, acc = _block_attn_update(q, k_blk, v_blk, m, l, acc,
                                       q_pos, k_pos_blk, scale,
                                       k_valid=k_valid_blk)
        # rotate the block (k/v + its positions/validity) to the next
        # device; overlapped with the next block's compute by XLA's async
        # collective scheduling
        rot = lambda x: jax.lax.ppermute(x, axis_name, perm)
        return rot(k_blk), rot(v_blk), rot(k_pos_blk), rot(k_valid_blk), m, l, acc

    _, _, _, _, m, l, acc = jax.lax.fori_loop(
        0, p, body, (k, v, q_pos, k_valid, m, l, acc))
    l = jnp.maximum(l, 1e-30)
    out = acc / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_causal_attention(
    q: jnp.ndarray,  # [B, T, H, D] global (RoPE already applied)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    seq_axis: str = "data",
    positions: jnp.ndarray | None = None,   # [B, T] int32
    attn_mask: jnp.ndarray | None = None,   # [B, T] bool (False = padding)
) -> jnp.ndarray:
    """Causal attention with the sequence sharded over `seq_axis`.

    Causality is decided on `positions` (default arange) and padding keys
    are masked via `attn_mask` — matching ops/attention.causal_attention's
    contract for left-padded batches. GQA note: expand k/v heads to match q
    before calling (or pass matching head counts).
    """
    B, T, H, D = q.shape
    scale = 1.0 / (D ** 0.5)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    if attn_mask is None:
        attn_mask = jnp.ones((B, T), bool)
    spec = P(None, seq_axis, None, None)
    spec2 = P(None, seq_axis)
    fn = shard_map(
        functools.partial(_ring_attention_shard, axis_name=seq_axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec2, spec2),
        out_specs=spec,
    )
    return fn(q, k, v, positions.astype(jnp.int32), attn_mask)

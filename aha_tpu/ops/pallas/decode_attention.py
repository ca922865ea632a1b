"""Fused decode-attention Pallas kernel over the ring-buffer KV cache.

The per-chunk streaming hot path (SURVEY §2.3 row 1: the TPU-native
replacement for the reference's flash-attention-2 decode dependency,
`/root/reference/models/arguments_live.py:30`). Fuses, per layer:

  RoPE-rotate cached keys by a per-slot table (rotate-half = lane roll
  with the sign folded into the sin table)  ->  masked GQA attention with
  online softmax over cache tiles streamed HBM -> VMEM.

Since the cache became pre-rotated (ops/attention.py), the per-slot table
passed in is the *residual* rotation: identity on ring slots, the sink-
column correction delta on sink slots (rotations compose, so the kernel is
unchanged).

Layout: queries grouped [B, KVH, M=n_rep*S, Dh] so each kv head's K/V tile
is shared by its `rep` query heads on the MXU row axis. Grid =
(B, W-blocks); inside a block the (KVH, Dh) minor dims are collapsed onto
lanes so the per-head slice is a 128-aligned lane slice, not a strided
VMEM relayout; online-softmax state lives in VMEM scratch across W-blocks.

Measured on v5e-1 (scripts/perf/ab_decode_attention.py, slope-timed over
in-jit loops to cancel the ~45 ms axon-tunnel dispatch cost; B=1, S=49,
W=2048 sink cache, bf16): XLA's fused jnp path runs **7.4 us/layer** —
within ~1.4x of the 5.3 us K+V DMA roofline, because XLA already fuses the
key rotation, masking and softmax into the attention loop without HBM
round-trips. This kernel's best configuration (full-width W block) is
18-21 us/layer: correct, but 2.5x off XLA. It stays opt-in
(AHA_DECODE_ATTN=pallas); the jnp path is the default. Note the whole op
is ~0.2 ms of the ~12.6 ms 7B frame step — the decode hot path is bound by
weight DMA (see ops/pallas/int4_matmul.py), not attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, *refs,
            kvh: int, scale: float, half: int, scaled: bool):
    if scaled:
        ks_ref, vs_ref, cos_ref, sin_ref, order_ref, g_ref = refs[:6]
    else:
        ks_ref = vs_ref = None
        cos_ref, sin_ref, order_ref, g_ref = refs[:4]
    o_ref, m_ref, l_ref, acc_ref = refs[-4:]
    w = pl.program_id(1)
    nw = pl.num_programs(1)
    Dh = q_ref.shape[-1]
    bw = k_ref.shape[1]

    @pl.when(w == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cos = cos_ref[0].astype(jnp.float32)   # [BW, Dh]
    sin = sin_ref[0].astype(jnp.float32)   # [BW, Dh], rotate-half sign folded in
    order = order_ref[0, 0, 0]             # [BW] int32 (-1 = empty slot)
    g_rows = g_ref[0, 0]                   # [MP] int32 (-1 = pad row)
    # visibility: slot occupied and not in the query's future
    # (ops/kv_cache.attention_slot_mask semantics)
    valid = (order[None, :] >= 0) & (order[None, :] <= g_rows[:, None])  # [MP, BW]

    # collapse (KVH, Dh) minor dims onto lanes: the per-head slice becomes a
    # 128-aligned lane slice instead of a strided VMEM relayout
    kk = k_ref[0].reshape(bw, kvh * Dh)
    vv = v_ref[0].reshape(bw, kvh * Dh)
    cdt = q_ref.dtype                       # compute dtype for the MXU dots

    for g in range(kvh):
        kg = kk[:, g * Dh:(g + 1) * Dh].astype(jnp.float32)  # [BW, Dh]
        k_rot = (kg * cos + pltpu.roll(kg, half, 1) * sin).astype(cdt)
        s = jax.lax.dot_general(
            q_ref[0, g], k_rot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # [MP, BW]
        if scaled:
            # int8 KV: per-(slot, head) K scales fold into the score
            # COLUMNS (scaling K rows == scaling s columns; the rotation
            # above is per-slot-linear, so it commutes with the scale) —
            # the cache itself streams int8, halving the K/V DMA exactly
            # like the jnp path (ops/attention.cached_attention).
            s = s * ks_ref[0, 0, 0:1, g * bw:(g + 1) * bw]   # [1, BW]
        s = jnp.where(valid, s, NEG_INF)

        # m/l scratch is lane-replicated [MP, Dh] so every intermediate
        # stays 2D (Mosaic cannot insert a minor dim on 1-bit vectors)
        m_prev = m_ref[g][:, :1]                             # [MP, 1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        safe = m_new > NEG_INF / 2
        alpha = jnp.where(safe, jnp.exp(m_prev - m_new), 0.0)
        p = jnp.exp(s - m_new)
        p = jnp.where(safe, p, 0.0)
        l_new = l_ref[g][:, :1] * alpha + p.sum(axis=-1, keepdims=True)
        if scaled:
            # V scales fold into the probability columns (p @ diag(vs) @ V)
            pv = p * vs_ref[0, 0, 0:1, g * bw:(g + 1) * bw]
        else:
            pv = p
        acc_ref[g] = acc_ref[g] * alpha + jnp.dot(
            pv.astype(cdt), vv[:, g * Dh:(g + 1) * Dh].astype(cdt),
            preferred_element_type=jnp.float32)
        m_ref[g] = jnp.broadcast_to(m_new, m_ref[g].shape)
        l_ref[g] = jnp.broadcast_to(l_new, l_ref[g].shape)

    @pl.when(w == nw - 1)
    def _():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _pick_block(n: int, target: int = 2048) -> int:
    """Nearest-to-target divisor; measured on v5e-1 wider W blocks win
    (128: 73 us, 544: 23 us, 2176 full-width: 18 us per 7B layer chunk)."""
    best = n
    for bw in range(8, min(n, 2 * target) + 1, 8):
        if n % bw == 0 and abs(bw - target) < abs(best - target):
            best = bw
    return best


@functools.partial(jax.jit, static_argnames=("block_w", "interpret"))
def cached_decode_attention(
    q_rot: jnp.ndarray,    # [B, S, NH, Dh]  (already RoPE-rotated)
    k_cache: jnp.ndarray,  # [B, Wp, KVH, Dh] (unrotated; may be int8)
    v_cache: jnp.ndarray,  # [B, Wp, KVH, Dh]
    k_cos: jnp.ndarray,    # [B, Wp, Dh] f32
    k_sin: jnp.ndarray,    # [B, Wp, Dh] f32 (unsigned; sign folded here)
    order: jnp.ndarray,    # [B, Wp] int32
    g: jnp.ndarray,        # [B, S] int32 query global indices
    kv_scales: tuple | None = None,  # (k_scale, v_scale) [B, Wp, KVH] —
    # int8 KV cache mode: the kernel streams the int8 buffers and folds
    # the per-(slot, head) scales into the score / probability columns
    # in VMEM (same algebra as the jnp path), so int8 KV keeps its
    # halved attention DMA under this backend too
    *,
    block_w: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [B, S, NH, Dh] attention output (same contract as the jnp
    path in ops/attention.cached_attention)."""
    B, S, NH, Dh = q_rot.shape
    Wp, KVH = k_cache.shape[1], k_cache.shape[2]
    n_rep = NH // KVH
    half = Dh // 2
    scale = 1.0 / (Dh ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    bw = block_w or _pick_block(Wp)
    assert Wp % bw == 0, (Wp, bw)

    # group the rep query heads onto the row axis: rows ordered (rep, s)
    M = n_rep * S
    MP = max(-(-M // 16) * 16, 16)
    qg = q_rot.reshape(B, S, KVH, n_rep, Dh).transpose(0, 2, 3, 1, 4)
    qg = qg.reshape(B, KVH, M, Dh)
    g_rows = jnp.tile(g, (1, n_rep))                       # [B, M]
    if MP > M:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, MP - M), (0, 0)))
        g_rows = jnp.pad(g_rows, ((0, 0), (0, MP - M)), constant_values=-1)

    # fold the rotate-half sign into sin (out_lane<half carries -x2); tables
    # follow the query dtype: bf16 in production halves the table DMA (they
    # are re-read once per kv head), f32 tests keep exact parity
    sign = jnp.concatenate([
        -jnp.ones((half,), jnp.float32), jnp.ones((half,), jnp.float32)])
    sin_signed = (k_sin * sign).astype(q_rot.dtype)
    cos_b = k_cos.astype(q_rot.dtype)

    # int32 metadata replicated across 8 sublanes (and order pre-tiled per
    # W-block) so blocks satisfy the (8, 128)-divisibility rule for any
    # batch size and block width
    nW = Wp // bw
    order_r = jnp.broadcast_to(
        order.reshape(B, nW, 1, bw), (B, nW, 8, bw))
    g_r = jnp.broadcast_to(g_rows[:, None, :], (B, 8, MP))

    scaled = kv_scales is not None
    extra_in, extra_specs = [], []
    if scaled:
        # per-(slot, head) scales laid out [B, nW, 8, KVH*bw]: head g's
        # block-column scales are the lane slice [g*bw:(g+1)*bw] (the 8
        # replicated sublanes satisfy the f32 (8, 128) tile rule). DMA
        # cost: 8*KVH*bw f32 per block vs the bw*KVH*Dh bytes the int8 K
        # tile saves — the halved cache stream survives the scales.
        def _prep(x):
            xr = x.reshape(B, nW, bw, KVH).transpose(0, 1, 3, 2)
            xr = xr.reshape(B, nW, 1, KVH * bw).astype(jnp.float32)
            return jnp.broadcast_to(xr, (B, nW, 8, KVH * bw))

        extra_in = [_prep(kv_scales[0]), _prep(kv_scales[1])]
        extra_specs = [
            pl.BlockSpec((1, 1, 8, KVH * bw), lambda b, w: (b, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, KVH * bw), lambda b, w: (b, w, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    grid = (B, Wp // bw)
    out = pl.pallas_call(
        functools.partial(_kernel, kvh=KVH, scale=scale, half=half,
                          scaled=scaled),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, KVH, MP, Dh), lambda b, w: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw, KVH, Dh), lambda b, w: (b, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw, KVH, Dh), lambda b, w: (b, w, 0, 0),
                         memory_space=pltpu.VMEM),
            *extra_specs,
            pl.BlockSpec((1, bw, Dh), lambda b, w: (b, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bw, Dh), lambda b, w: (b, w, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, bw), lambda b, w: (b, w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, MP), lambda b, w: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KVH, MP, Dh), lambda b, w: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KVH, MP, Dh), q_rot.dtype),
        scratch_shapes=[
            pltpu.VMEM((KVH, MP, Dh), jnp.float32),  # m (lane-replicated)
            pltpu.VMEM((KVH, MP, Dh), jnp.float32),  # l (lane-replicated)
            pltpu.VMEM((KVH, MP, Dh), jnp.float32),  # acc
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qg, k_cache, v_cache, *extra_in, cos_b, sin_signed, order_r, g_r)

    out = out[:, :, :M].reshape(B, KVH, n_rep, S, Dh)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, S, NH, Dh)

"""Static-shape ring-buffer KV cache with pluggable eviction policies.

TPU-first redesign of the reference's three dynamic torch caches:

  * SinkCache   (`/root/reference/test/sink_cache.py:7-164`)  — attention sinks
    + sliding window with RoPE key re-rotation on eviction,
  * SlidingWindowCache (`/root/reference/test/sliding_window_cache.py:5-53`) —
    keep-last-window, keys keep their original rotations,
  * TrulyStaticCache  (`/root/reference/test/static_cache.py:5-47`) — freeze the
    first forward's KV forever (prefix-only attention ablation),
  * plus the unbounded "none" policy (HF DynamicCache behavior).

All four become one mechanism. The cache is a preallocated buffer of
`window + 1` slots per layer (the last slot is a junk slot that absorbs
writes of padded/overflow tokens, keeping every shape static under jit).
Keys are stored **unrotated**; each slot records

  * ``order``   — the global index of the token it holds (-1 = empty), and
  * ``key_pos`` — the RoPE position the key should be rotated by at read time.

Eviction is slot reuse (ring arithmetic); the sink policy's re-rotation is a
subtraction on ``key_pos``; causal masking within a freshly written chunk is
``order <= g_query``. No concatenation, no dynamic shapes, no host logic.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Policy (static / hashable — part of the jit cache key)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CachePolicy:
    """kind: 'none' | 'sliding' | 'sink' | 'static'.

    window   — number of real slots (the junk slot is extra).
    num_sink — sink region size (sink policy only).
    slot_pad — extra slots beyond the window (>= 1). Slot `window` is the
        junk slot that absorbs padded-token writes; any further pad slots
        are never written (order stays -1, so they are masked everywhere).
        Under AHA_DECODE_ATTN=pallas the engine rounds num_slots up to a
        multiple of 128 (`with_aligned_slots`) so the Pallas decode-
        attention kernel gets tileable cache shapes.
    mask_mode — 'hf' (default) replicates the reference's HF mask
        arithmetic: a slot is visible iff its index in the reference's
        concatenated cache layout (<= order - evicted_count for ring
        entries) does not exceed the query's cache_position (q_pos). With
        get_seq_length capped at the window this makes post-fill chunks
        attend NON-CAUSALLY within the chunk — transformers 4.49
        (`masking_utils`/`_prepare_4d_causal_attention_mask_with_cache_
        position`) masks kv index > cache_position only, and once the
        cache is full every stored index < window <= cache_position. All
        reference benchmarks ran 400-frame (~19.6k-token) streams against
        window 2048, so published scores embed this behavior; parity
        requires it. 'strict' enforces true causality (order <= g) —
        identical before the first eviction and for S=1 decode steps.
    """

    kind: str = "sink"
    window: int = 2048
    num_sink: int = 32
    slot_pad: int = 1
    mask_mode: str = "hf"

    def __post_init__(self):
        if self.kind not in ("none", "sliding", "sink", "static"):
            raise ValueError(f"unknown cache kind {self.kind}")
        if self.kind == "sink" and not 0 <= self.num_sink < self.window:
            raise ValueError("need 0 <= num_sink < window")
        if self.slot_pad < 1:
            raise ValueError("slot_pad must be >= 1 (the junk slot)")
        if self.mask_mode not in ("hf", "strict"):
            raise ValueError(f"unknown mask_mode {self.mask_mode}")

    @property
    def num_slots(self) -> int:
        return self.window + self.slot_pad

    @property
    def junk(self) -> int:
        return self.window

    def with_aligned_slots(self, multiple: int = 128) -> "CachePolicy":
        """Round num_slots up to a multiple (kernel-tileable cache shape)."""
        pad = max(1, (-(self.window + 1)) % multiple + 1)
        return dataclasses.replace(self, slot_pad=pad)


# ---------------------------------------------------------------------------
# Cache state (pytree)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: jnp.ndarray        # [L, B, W+1, KVH, Dh] unrotated keys
    v: jnp.ndarray        # [L, B, W+1, KVH, Dh]
    key_pos: jnp.ndarray  # [B, W+1] int32 — RoPE position per slot
    order: jnp.ndarray    # [B, W+1] int32 — global token index per slot, -1 empty
    seen: jnp.ndarray     # [B] int32 — total tokens ever offered
    length: jnp.ndarray   # [B] int32 — current logical cache length
    # int8 KV mode only (k/v stored int8): per-(slot, head) dequant scales
    k_scale: jnp.ndarray | None = None   # [L, B, W+1, KVH] f32
    v_scale: jnp.ndarray | None = None

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_cache(
    policy: CachePolicy,
    *,
    num_layers: int,
    batch: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> KVCache:
    """dtype=jnp.int8 stores K/V quantized per (slot, head) with f32 scales
    — half the cache HBM and half the attention K/V DMA of bf16 (the
    'optionally int8 KV' long-context option; ~0.5% attention-output
    error, opt-in via InferConfig.kv_cache_dtype)."""
    W1 = policy.num_slots
    quant = jnp.dtype(dtype) == jnp.int8
    return KVCache(
        k=jnp.zeros((num_layers, batch, W1, num_kv_heads, head_dim), dtype),
        v=jnp.zeros((num_layers, batch, W1, num_kv_heads, head_dim), dtype),
        key_pos=jnp.zeros((batch, W1), jnp.int32),
        order=jnp.full((batch, W1), -1, jnp.int32),
        seen=jnp.zeros((batch,), jnp.int32),
        length=jnp.zeros((batch,), jnp.int32),
        k_scale=jnp.ones((num_layers, batch, W1, num_kv_heads), jnp.float32)
        if quant else None,
        v_scale=jnp.ones((num_layers, batch, W1, num_kv_heads), jnp.float32)
        if quant else None,
    )


def reset_cache(cache: KVCache) -> KVCache:
    return dataclasses.replace(
        cache,
        order=jnp.full_like(cache.order, -1),
        key_pos=jnp.zeros_like(cache.key_pos),
        seen=jnp.zeros_like(cache.seen),
        length=jnp.zeros_like(cache.length),
    )


def reset_cache_rows(cache: KVCache, rows: jnp.ndarray) -> KVCache:
    """Reset only the batch rows where `rows` ([B] bool) is True — the
    continuous-batching admit path (a finished stream's slot is recycled for
    the next one). Like `reset_cache`, stale K/V stay in place: emptied
    metadata (order=-1, length=0) masks them out of every attention read."""
    r = rows
    return dataclasses.replace(
        cache,
        order=jnp.where(r[:, None], -1, cache.order),
        key_pos=jnp.where(r[:, None], 0, cache.key_pos),
        seen=jnp.where(r, 0, cache.seen),
        length=jnp.where(r, 0, cache.length),
    )


# ---------------------------------------------------------------------------
# Update planning
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class UpdatePlan:
    """Where a chunk of S new tokens goes, with all policy effects resolved.

    Shapes: [B, S] unless noted. Computed once per chunk, shared by layers.
    """

    slots: jnp.ndarray     # destination slot per token (junk for invalid)
    g: jnp.ndarray         # global token index
    q_pos: jnp.ndarray     # effective RoPE position of the query
    write_pos: jnp.ndarray  # position keys are PRE-ROTATED at before storage:
    #   sink policy -> g (absolute stream index; ring-slot relative distances
    #   q_pos - key_pos == g_q - g_k whenever the slot residual g_k - key_pos
    #   equals the row drift seen - length — true everywhere except the
    #   transient after a partial first eviction event — so stored keys need
    #   no per-chunk re-rotation; cached_attention corrects the sink columns
    #   score-side and switches to exact rotate-at-read during the transient);
    #   other policies -> q_pos (key_pos never mutates after insert there).
    valid: jnp.ndarray     # bool — token is real (not padding)
    shift: jnp.ndarray     # [B] — sink-policy key_pos shift for retained ring slots
    new_key_pos: jnp.ndarray   # [B, W+1] — slot positions after this update
    new_order: jnp.ndarray     # [B, W+1]
    new_seen: jnp.ndarray      # [B]
    new_length: jnp.ndarray    # [B]


def plan_update(cache: KVCache, policy: CachePolicy, valid_len: jnp.ndarray, S: int) -> UpdatePlan:
    """valid_len: [B] int32, number of real tokens in the S-sized chunk."""
    W = policy.window
    junk = policy.junk
    B = cache.batch
    i = jnp.arange(S, dtype=jnp.int32)[None, :]          # [1, S]
    valid = i < valid_len[:, None]                        # [B, S]
    g = cache.seen[:, None] + i                           # [B, S]
    q_pos = cache.length[:, None] + i                     # [B, S]

    if policy.kind == "none":
        slots = g
    elif policy.kind == "sliding":
        slots = g % W
    elif policy.kind == "sink":
        s = policy.num_sink
        ring = W - s
        slots = jnp.where(g < s, g, s + (g - s) % ring)
    elif policy.kind == "static":
        first_chunk = (cache.seen == 0)[:, None]
        slots = jnp.where(first_chunk & (g < W), g, junk)
    else:  # pragma: no cover
        raise AssertionError(policy.kind)
    slots = jnp.where(valid, slots, junk).astype(jnp.int32)

    # Sink-policy eviction event: ref sink_cache.py:129 — the shifting branch
    # fires when chunk + current length reaches the window; retained ring keys
    # are re-rotated back by the chunk size. Here: key_pos -= valid_len.
    if policy.kind == "sink":
        event = (cache.length + valid_len) >= W
        shift = jnp.where(event, valid_len, 0).astype(jnp.int32)
    else:
        shift = jnp.zeros((B,), jnp.int32)

    # --- metadata after the update -------------------------------------
    slot_idx = jnp.arange(policy.num_slots, dtype=jnp.int32)[None, :]  # [1, W+1]
    is_ring = slot_idx >= policy.num_sink if policy.kind == "sink" else jnp.zeros_like(slot_idx, bool)
    occupied = cache.order >= 0
    key_pos = jnp.where(
        is_ring & occupied, cache.key_pos - shift[:, None], cache.key_pos
    )

    def scatter_meta(dst, src):
        return jax.vmap(lambda d, idx, s: d.at[idx].set(s))(dst, slots, src)

    key_pos = scatter_meta(key_pos, q_pos)
    order = scatter_meta(cache.order, g)
    # the junk slot never becomes valid
    order = order.at[:, junk].set(-1)

    new_seen = cache.seen + valid_len
    if policy.kind == "none":
        new_length = cache.length + valid_len
    elif policy.kind == "static":
        new_length = jnp.where(
            cache.seen == 0, jnp.minimum(valid_len, W), cache.length
        )
    else:
        new_length = jnp.minimum(cache.length + valid_len, W)

    return UpdatePlan(
        slots=slots,
        g=g,
        q_pos=q_pos,
        write_pos=g if policy.kind == "sink" else q_pos,
        valid=valid,
        shift=shift,
        new_key_pos=key_pos,
        new_order=order,
        new_seen=new_seen,
        new_length=new_length,
    )


def quantize_kv(x: jnp.ndarray):
    """[B, S, KVH, Dh] -> (int8 values, f32 scales [B, S, KVH]) — symmetric
    per-(token, head)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def write_layer(
    k_cache: jnp.ndarray,  # [B, W+1, KVH, Dh]
    v_cache: jnp.ndarray,
    k_new: jnp.ndarray,    # [B, S, KVH, Dh] (unrotated)
    v_new: jnp.ndarray,
    plan: UpdatePlan,
    k_scale: jnp.ndarray | None = None,   # [B, W+1, KVH] (int8 KV mode)
    v_scale: jnp.ndarray | None = None,
    *,
    rot: tuple | None = None,             # (cos, sin) at plan.write_pos
    rope_theta: float | None = None,      # compute rot here (convenience)
):
    """Scatter a chunk into one layer's slots (junk slot absorbs padding).
    Returns (k_cache, v_cache, k_scale, v_scale) — scales are None outside
    int8 KV mode.

    rot / rope_theta: pre-rotate k_new at plan.write_pos before storage (the
    production decode path — cached_attention assumes a pre-rotated cache).
    Callers with per-chunk hoisted tables pass `rot`; when both are None the
    keys are stored raw (low-level cache-invariant tests only)."""
    if rot is None and rope_theta is not None:
        from .rope import rope_cos_sin

        rot = rope_cos_sin(plan.write_pos, k_new.shape[-1], rope_theta)
    if rot is not None:
        from .rope import apply_rope

        w_cos, w_sin = rot
        k_new = apply_rope(k_new.astype(jnp.float32), w_cos, w_sin).astype(k_new.dtype)

    def scat(buf, idx, val):
        return buf.at[idx].set(val)

    if k_cache.dtype == jnp.int8:
        k_new, ks = quantize_kv(k_new)
        v_new, vs = quantize_kv(v_new)
        k_scale = jax.vmap(scat)(k_scale, plan.slots, ks)
        v_scale = jax.vmap(scat)(v_scale, plan.slots, vs)
    else:
        # explicit cast: scatter with a wider value dtype is a FutureWarning
        # (soon an error) under jax_numpy_dtype_promotion=standard
        k_new = k_new.astype(k_cache.dtype)
        v_new = v_new.astype(v_cache.dtype)
    k_cache = jax.vmap(scat)(k_cache, plan.slots, k_new)
    v_cache = jax.vmap(scat)(v_cache, plan.slots, v_new)
    return k_cache, v_cache, k_scale, v_scale


def write_layer_stacked(
    k_all: jnp.ndarray,    # [L, B, W+1, KVH, Dh] — the full stacked cache
    v_all: jnp.ndarray,
    layer,                 # traced int32 — which layer's slots to write
    k_new: jnp.ndarray,    # [B, S, KVH, Dh] (unrotated)
    v_new: jnp.ndarray,
    plan: UpdatePlan,
    ks_all: jnp.ndarray | None = None,    # [L, B, W+1, KVH] (int8 KV mode)
    vs_all: jnp.ndarray | None = None,
    *,
    rot: tuple | None = None,             # (cos, sin) at plan.write_pos
):
    """`write_layer` for a layer loop that CARRIES the stacked caches.

    KEPT AS A MEASURED NEGATIVE RESULT — not the production path. The
    theory was that the scan-ys formulation streams the whole ~2 GB cache
    every decode pass, and an in-place carried write would save it. On the
    v5e-1 7B B=8 decode BOTH variants lost to the scan by ~9x:
      * batched scatter (`buf.at[layer, bidx, slots].set`): 44.8 tok/s —
        XLA does not alias scatter on a loop carry; it copies the full
        stacked buffer every layer;
      * this per-row `dynamic_update_slice` form: 45.4 tok/s — the DUS
        itself aliases, but the DUS write and the attention read want
        DIFFERENT layouts of the carried buffer, and layout assignment
        inserts 4 full-cache transposing copies per layer iteration
        (visible in the compiled HLO's inner while region).
    A donated while-loop microbench further shows the scan-ys form is
    already aliased fully in place by XLA (~0 ms/step of cache cost), so
    there was nothing to win. Production = `write_layer` under lax.scan;
    AHA_CACHE_LOOP=fori reproduces this experiment.

    Returns (k_all, v_all, ks_all, vs_all, k_c, v_c, ks_c, vs_c) — the
    updated stacked buffers plus this layer's slices for attention.
    """
    if rot is not None:
        from .rope import apply_rope

        w_cos, w_sin = rot
        k_new = apply_rope(k_new.astype(jnp.float32), w_cos, w_sin).astype(k_new.dtype)

    B, S = k_new.shape[:2]
    z = jnp.int32(0)

    ks = vs = None
    if k_all.dtype == jnp.int8:
        k_new, ks = quantize_kv(k_new)
        v_new, vs = quantize_kv(v_new)
    else:
        k_new = k_new.astype(k_all.dtype)
        v_new = v_new.astype(v_all.dtype)

    for b in range(B):
        bi = jnp.int32(b)
        for s in range(S):
            slot = plan.slots[b, s]
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_new[b, s][None, None, None], (layer, bi, slot, z, z))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_new[b, s][None, None, None], (layer, bi, slot, z, z))
            if ks is not None:
                ks_all = jax.lax.dynamic_update_slice(
                    ks_all, ks[b, s][None, None, None], (layer, bi, slot, z))
                vs_all = jax.lax.dynamic_update_slice(
                    vs_all, vs[b, s][None, None, None], (layer, bi, slot, z))

    ks_c = vs_c = None
    if ks is not None:
        ks_c = jax.lax.dynamic_index_in_dim(ks_all, layer, 0, keepdims=False)
        vs_c = jax.lax.dynamic_index_in_dim(vs_all, layer, 0, keepdims=False)
    k_c = jax.lax.dynamic_index_in_dim(k_all, layer, 0, keepdims=False)
    v_c = jax.lax.dynamic_index_in_dim(v_all, layer, 0, keepdims=False)
    return k_all, v_all, ks_all, vs_all, k_c, v_c, ks_c, vs_c


def advance(cache: KVCache, plan: UpdatePlan, new_k: jnp.ndarray, new_v: jnp.ndarray,
            new_k_scale=None, new_v_scale=None) -> KVCache:
    """Produce the post-chunk cache. new_k/new_v: [L, B, W+1, KVH, Dh] already
    written by write_layer inside the layer scan."""
    return KVCache(
        k=new_k,
        v=new_v,
        key_pos=plan.new_key_pos,
        order=plan.new_order,
        seen=plan.new_seen,
        length=plan.new_length,
        k_scale=new_k_scale,
        v_scale=new_v_scale,
    )


def attention_slot_mask(plan: UpdatePlan, *, sink_slots: int = 0,
                        mode: str = "strict") -> jnp.ndarray:
    """[B, S, W+1] bool — which slots each query token may attend to.

    mode='strict': a slot is visible iff it is occupied (order >= 0) and
    holds a token that is not in the query's future (order <= g_query).
    Covers cross-chunk causality, intra-chunk causality, eviction, and the
    static policy's "prefix-only" semantics in one predicate.

    mode='hf': the reference's transformers mask arithmetic (see
    CachePolicy.mask_mode): visible iff occupied and the slot's index in
    the reference's concatenated cache layout <= the query's
    cache_position. The reference index of a slot is its order for sink
    entries (the first `sink_slots` tokens, never moved) and
    order - evicted_count for ring entries, where evicted_count =
    seen - length (the ring always holds the most recent consecutive
    tokens). Identical to 'strict' until the first eviction event;
    afterwards post-fill chunks see their own future tokens, exactly like
    the reference.
    """
    order = plan.new_order[:, None, :]      # [B, 1, W+1]
    if mode == "strict":
        g = plan.g[:, :, None]              # [B, S, 1]
        return (order >= 0) & (order <= g)
    ref_idx, q_cap = reference_mask_operands(plan, sink_slots=sink_slots)
    return (order >= 0) & (ref_idx[:, None, :] <= q_cap[:, :, None])


def reference_mask_operands(plan: UpdatePlan, *, sink_slots: int = 0):
    """(ref_idx [B, W+1], q_cap [B, S]) such that `occupied & (ref_idx <=
    q_cap)` reproduces the reference's HF visibility (mask_mode='hf').
    Shared by the jnp mask and the Pallas decode kernel (which compares
    order <= g per (row, slot) — pass ref_idx as order and q_cap as g)."""
    evicted = (plan.new_seen - plan.new_length)[:, None]          # [B, 1]
    ref_idx = plan.new_order - jnp.where(
        plan.new_order >= sink_slots, evicted, 0)
    # keep empty slots at a sentinel below 0 so `order >= 0` still gates
    ref_idx = jnp.where(plan.new_order >= 0, ref_idx, -1)
    return ref_idx, plan.q_pos

"""Qwen2-family decoder as pure functions over a param pytree.

Replaces the reference's dependence on transformers' Qwen2 torch modules
(`/root/reference/models/live_llava/video_head_live_llava_qwen.py:63-80`)
with a TPU-first design:

  * layer params stacked on a leading L axis, traversed with ``lax.scan``
    (one compiled layer body, fast compiles, natural FSDP/TP sharding axes);
  * one attention core shared by training (full causal) and streaming
    (ring-buffer cache chunks) — the reference's three decode entry points
    collapse onto ``forward_hidden`` and ``decode_chunk``;
  * optional LoRA delta trees folded into the projections at apply time.

Weight layout: kernels are [in, out] (right-multiplication, natural for
``x @ W`` on the MXU); HF checkpoints are transposed on conversion
(models/loader.py).
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp

from aha_tpu.config import QwenConfig
from aha_tpu.ops import attention
from aha_tpu.ops.attention import cached_attention, causal_attention

# LoRA dropout mask generator: "rbg" (hardware RNG, default — see
# _ab_delta) | "threefry" (the pre-round-5 path, kept for A/B)
_DROPOUT_RNG_IMPL = os.environ.get("AHA_DROPOUT_RNG", "rbg")
from aha_tpu.ops.rope import rope_cos_sin
from aha_tpu.ops.kv_cache import (
    CachePolicy,
    KVCache,
    UpdatePlan,
    advance,
    plan_update,
    write_layer,
    write_layer_stacked,
)


# ---------------------------------------------------------------------------
# Param init
# ---------------------------------------------------------------------------


def init_params(cfg: QwenConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random-init decoder params (normal(0.02), zeros bias, ones norm)."""
    k = iter(jax.random.split(key, 16))

    def dense(kk, shape):
        return (0.02 * jax.random.normal(kk, shape)).astype(dtype)

    L, H, I = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    QD, KD = cfg.q_dim, cfg.kv_dim
    layers = {
        "input_norm": {"scale": jnp.ones((L, H), dtype)},
        "q_proj": {"kernel": dense(next(k), (L, H, QD)), "bias": jnp.zeros((L, QD), dtype)},
        "k_proj": {"kernel": dense(next(k), (L, H, KD)), "bias": jnp.zeros((L, KD), dtype)},
        "v_proj": {"kernel": dense(next(k), (L, H, KD)), "bias": jnp.zeros((L, KD), dtype)},
        "o_proj": {"kernel": dense(next(k), (L, QD, H))},
        "post_norm": {"scale": jnp.ones((L, H), dtype)},
        "gate_proj": {"kernel": dense(next(k), (L, H, I))},
        "up_proj": {"kernel": dense(next(k), (L, H, I))},
        "down_proj": {"kernel": dense(next(k), (L, I, H))},
    }
    params = {
        "embed": {"weight": dense(next(k), (cfg.vocab_size, H))},
        "layers": layers,
        "final_norm": {"scale": jnp.ones((H,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = {"kernel": dense(next(k), (H, cfg.vocab_size))}
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def _idx(a, layer):
    """Static pass-through or dynamic layer slice of a stacked array."""
    if layer is None:
        return a
    return jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False)


def linear(x: jnp.ndarray, p: dict, lora: dict | None = None, lora_scale: float = 0.0,
           layer=None, lora_dropout: float = 0.0) -> jnp.ndarray:
    """layer: optional traced int — p (and lora) carry stacked [L, ...]
    leaves and this layer is selected. Quantized kernels pass the index all
    the way into the Pallas kernel (scalar prefetch) so the scan never
    copies a weight slice; dense kernels take a dynamic slice that XLA
    fuses into the einsum."""
    kernel = p["kernel"]
    if isinstance(kernel, dict):  # int8/int4 quantization (ops/quant.py)
        from aha_tpu.ops.quant import qlinear

        y = qlinear(x, kernel, layer=layer)
    else:
        y = jnp.einsum("...i,io->...o", x, _idx(kernel, layer))
    if lora is not None:
        y = y + _ab_delta(x, lora, lora_scale, layer, lora_dropout)
    if "bias" in p:
        y = y + _idx(p["bias"], layer)
    return y


def _ab_delta(x, ab: dict, lora_scale, layer, dropout_rate: float = 0.0):
    """scale * (x @ A) @ B — computed at low rank, never materializing
    W+ΔW. Adapters are f32 masters; the delta is cast back to the
    activation dtype so bf16 carries stay bf16 under scan.

    dropout_rate > 0 with an "rng" leaf in `ab` (train-time only — see
    forward_hidden) applies inverted dropout to the ADAPTER INPUT, the
    reference's peft `lora_dropout=0.05` semantics (one independent mask
    per projection per layer per step; the frozen base path never sees it).

    Mask bits come from the hardware RNG (`rbg` impl) rather than
    threefry: the masks cover ~1e9 elements per 7B step (7 projection
    sites x [B, T, H-or-I] x 28 layers, REGENERATED in the remat'd
    backward), and threefry computes them on the MXU-starved vector
    units — measured 122 ms of a 512 ms B=1 T=926 QLoRA step (+31%,
    scripts/perf/qlora_7b_train_step.py --no_dropout A/B, BASELINE.md
    round 5). The per-site raw key still derives from the threefry
    chain (seed, step, projection, layer), so masks stay deterministic
    and independent per site; only the bitstream generator changes —
    dropout needs no cryptographic stream. AHA_DROPOUT_RNG=threefry
    restores the old path for A/B."""
    if dropout_rate > 0.0 and "rng" in ab:
        keep = 1.0 - dropout_rate
        k = _idx(ab["rng"], layer)                    # [2] u32 raw key
        if _DROPOUT_RNG_IMPL == "rbg":
            k = jax.random.wrap_key_data(
                jnp.concatenate([k, k]), impl="rbg")  # [4] u32 key data
        mask = jax.random.bernoulli(k, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    return (lora_scale * jnp.einsum(
        "...r,ro->...o",
        jnp.einsum("...i,ir->...r", x, _idx(ab["a"], layer)),
        _idx(ab["b"], layer))).astype(x.dtype)


def _layer_lora(lora: dict | None, name: str):
    if lora is None or name not in lora:
        return None
    return lora[name]


def _lora_delta(x, lora, name, lora_scale, layer, lora_dropout: float = 0.0):
    l = _layer_lora(lora, name)
    if l is None:
        return 0.0
    return _ab_delta(x, l, lora_scale, layer, lora_dropout)


def _mlp(x, lp, lora, lora_scale, layer=None, lora_dropout=0.0):
    if "gate_up_proj" in lp:
        # merged layout (ops/quant.merge_decoder_projections): one kernel
        # call for gate+up, per-projection LoRA added on the output slices
        y = linear(x, {"kernel": lp["gate_up_proj"]["kernel"]}, None, 0.0, layer)
        I = y.shape[-1] // 2
        gate = y[..., :I] + _lora_delta(x, lora, "gate_proj", lora_scale, layer, lora_dropout)
        up = y[..., I:] + _lora_delta(x, lora, "up_proj", lora_scale, layer, lora_dropout)
    else:
        gate = linear(x, {"kernel": lp["gate_proj"]["kernel"]}, _layer_lora(lora, "gate_proj"), lora_scale, layer, lora_dropout)
        up = linear(x, {"kernel": lp["up_proj"]["kernel"]}, _layer_lora(lora, "up_proj"), lora_scale, layer, lora_dropout)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return linear(act, {"kernel": lp["down_proj"]["kernel"]}, _layer_lora(lora, "down_proj"), lora_scale, layer, lora_dropout)


def _qkv(x, lp, cfg: QwenConfig, lora, lora_scale, layer=None, lora_dropout=0.0):
    B, S, _ = x.shape
    if "qkv_proj" in lp:
        y = linear(x, lp["qkv_proj"], None, 0.0, layer)
        QD, KD = cfg.q_dim, cfg.kv_dim
        q = y[..., :QD] + _lora_delta(x, lora, "q_proj", lora_scale, layer, lora_dropout)
        k = y[..., QD:QD + KD] + _lora_delta(x, lora, "k_proj", lora_scale, layer, lora_dropout)
        v = y[..., QD + KD:] + _lora_delta(x, lora, "v_proj", lora_scale, layer, lora_dropout)
    else:
        q = linear(x, lp["q_proj"], _layer_lora(lora, "q_proj"), lora_scale, layer, lora_dropout)
        k = linear(x, lp["k_proj"], _layer_lora(lora, "k_proj"), lora_scale, layer, lora_dropout)
        v = linear(x, lp["v_proj"], _layer_lora(lora, "v_proj"), lora_scale, layer, lora_dropout)
    q = q.reshape(B, S, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    return q, k, v


# ---------------------------------------------------------------------------
# Full-sequence forward (training / prefill without cache)
# ---------------------------------------------------------------------------


def forward_hidden(
    params: dict,
    cfg: QwenConfig,
    inputs_embeds: jnp.ndarray,          # [B, T, H]
    *,
    attn_mask: jnp.ndarray | None = None,  # [B, T] bool
    positions: jnp.ndarray | None = None,  # [B, T]
    lora: dict | None = None,
    lora_scale: float = 0.0,
    remat: bool | str = False,   # False/'none' | True/'full' | 'dots' | 'dots_no_batch'
    ring: tuple | None = None,   # (mesh, seq_axis): sequence-parallel attention
    pipe: tuple | None = None,   # (mesh, pipe_axis, n_micro): GPipe stages
    lora_dropout: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Final hidden states [B, T, H] via scan over stacked layers.

    ring=(mesh, axis): attention runs sequence-sharded over the mesh axis
    via parallel/ring_attention.py (the SURVEY §5 long-context scaling path
    beyond the cache window) — K/V shards rotate over ICI with overlapping
    compute; everything else in the layer stays under GSPMD.

    lora_dropout + dropout_rng (train-time): the reference's peft
    lora_dropout (modeling_live.py:153-164, rate LoraConfig.dropout) —
    per-(projection, layer) keys are pre-split and stacked on the layer
    axis so the same lax.scan slices them alongside the adapters."""
    x = inputs_embeds
    if lora is not None and lora_dropout > 0.0 and dropout_rng is not None:
        L = next(iter(lora.values()))["a"].shape[0]
        lora = {
            name: {**ab, "rng": jax.random.split(
                jax.random.fold_in(dropout_rng, i), L)}
            for i, (name, ab) in enumerate(sorted(lora.items()))
        }
    else:
        lora_dropout = 0.0
    B, T = x.shape[:2]
    # cos/sin are layer-invariant: compute once, not once per scanned layer
    pos = positions if positions is not None else jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None], (B, T))
    rope_tables = rope_cos_sin(pos, cfg.head_dim, cfg.rope_theta)

    def make_layer_fn(attn_mask_, positions_, rope_tables_, pos_):
        """Layer body parameterized by its batch-dependent operands so the
        pipeline path can feed microbatch slices (everything else closes
        over layer-invariant config)."""

        def attention(q, k, v):
            if ring is None:
                return causal_attention(
                    q, k, v, rope_theta=cfg.rope_theta, positions=positions_,
                    attn_mask=attn_mask_, rope_tables=rope_tables_,
                )
            from aha_tpu.ops.rope import apply_rope
            from aha_tpu.parallel.ring_attention import ring_causal_attention

            mesh, seq_axis = ring
            cos, sin = rope_tables_
            q = apply_rope(q.astype(jnp.float32), cos, sin).astype(q.dtype)
            k = apply_rope(k.astype(jnp.float32), cos, sin).astype(k.dtype)
            # GQA: expand kv heads to match q (ring transfers at full width)
            rep = cfg.num_heads // cfg.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            return ring_causal_attention(q, k, v, mesh, seq_axis=seq_axis,
                                         positions=pos_, attn_mask=attn_mask_)

        def layer_fn(x, scanned):
            lp, lora_l = scanned
            h = rms_norm(x, lp["input_norm"]["scale"], cfg.rms_norm_eps)
            q, k, v = _qkv(h, lp, cfg, lora_l, lora_scale, lora_dropout=lora_dropout)
            attn = attention(q, k, v)
            attn = attn.reshape(*x.shape[:2], cfg.q_dim)
            x = x + linear(attn, lp["o_proj"], _layer_lora(lora_l, "o_proj"),
                           lora_scale, lora_dropout=lora_dropout)
            h = rms_norm(x, lp["post_norm"]["scale"], cfg.rms_norm_eps)
            x = x + _mlp(h, lp, lora_l, lora_scale, lora_dropout=lora_dropout)
            return x, None

        return layer_fn

    if remat in (True, "full"):
        # save nothing: every layer recomputes its forward in backward
        wrap = jax.checkpoint
    elif remat == "dots":
        # save matmul outputs, recompute the cheap elementwise/norm ops —
        # trades HBM for skipping the 2N forward recompute in backward
        import functools
        wrap = functools.partial(
            jax.checkpoint, policy=jax.checkpoint_policies.checkpoint_dots)
    elif remat == "dots_no_batch":
        import functools
        wrap = functools.partial(
            jax.checkpoint,
            policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims)
    elif remat == "half":
        # checkpoint alternating layers: scan over 2-layer blocks, remat
        # only the first of each pair — backward recomputes HALF the
        # forward (useful/executed (2F+dW)/(2.5F+dW) ≈ .83 vs full's .67)
        # for ~L/2 layers of saved residuals. The middle rung between
        # 'full' and 'dots' where 'dots' fails to compile (BASELINE.md:
        # the axon remote-compile stack rejects the 7B dots lowering).
        wrap = "half"
    elif remat in (False, None, "none"):
        wrap = None
    else:
        raise ValueError(f"unknown remat policy: {remat!r}")

    if pipe is not None:
        assert ring is None, "pipe and ring attention are mutually exclusive"
        if wrap == "half":
            raise ValueError("remat='half' pairs layers in the plain scan; "
                             "use 'full'/'dots' with pipeline stages")
        from aha_tpu.parallel.pipeline import gpipe_scan_layers

        mesh_p, axis_p, n_micro = pipe
        cos_t, sin_t = rope_tables
        extras = {"mask": attn_mask, "positions": positions,
                  "cos": cos_t, "sin": sin_t, "pos": pos}

        def layer_fn_mb(x_mb, scanned, ex):
            fn = make_layer_fn(ex["mask"], ex["positions"],
                               (ex["cos"], ex["sin"]), ex["pos"])
            return fn(x_mb, scanned)[0]

        x = gpipe_scan_layers(mesh_p, axis_p, params["layers"], lora, x,
                              extras, layer_fn_mb, n_micro, wrap=wrap)
    else:
        layer_fn = make_layer_fn(attn_mask, positions, rope_tables, pos)
        if wrap == "half":
            L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
            if L % 2:
                raise ValueError(f"remat='half' needs an even layer count "
                                 f"(got {L})")
            pair = lambda t: t.reshape(L // 2, 2, *t.shape[1:])
            scanned = jax.tree.map(pair, (params["layers"], lora))
            ck_layer = jax.checkpoint(layer_fn)

            def block_fn(x, blk):
                x, _ = ck_layer(x, jax.tree.map(lambda t: t[0], blk))
                x, _ = layer_fn(x, jax.tree.map(lambda t: t[1], blk))
                return x, None

            x, _ = jax.lax.scan(block_fn, x, scanned)
        else:
            if wrap is not None:
                layer_fn = wrap(layer_fn)
            x, _ = jax.lax.scan(layer_fn, x, (params["layers"], lora))
    return rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# Streaming decode over the ring-buffer cache
# ---------------------------------------------------------------------------


def decode_chunk(
    params: dict,
    cfg: QwenConfig,
    policy: CachePolicy,
    cache: KVCache,
    inputs_embeds: jnp.ndarray,   # [B, S, H]
    valid_len: jnp.ndarray,       # [B]
    *,
    lora: dict | None = None,
    lora_scale: float = 0.0,
) -> tuple[jnp.ndarray, KVCache]:
    """One streaming chunk: returns (final hidden [B, S, H], updated cache).

    The update plan (slots/positions/mask) is computed once and shared by all
    layers; the layer scan carries the hidden state and streams each layer's
    cache slice through `write_layer` + `cached_attention`.
    """
    S = inputs_embeds.shape[1]
    plan: UpdatePlan = plan_update(cache, policy, valid_len, S)
    # positions are identical across layers — one cos/sin table per chunk
    # instead of one per layer (28x fewer transcendentals on the 7B). Keys
    # are stored pre-rotated at write_pos, so the only tables needed are
    # over the S chunk tokens (the old scheme built a [B, W+1] key table
    # and re-rotated the whole cache every layer).
    w_cos, w_sin = rope_cos_sin(plan.write_pos, cfg.head_dim, cfg.rope_theta)
    sink_policy = policy.kind == "sink"
    sink_slots = policy.num_sink if sink_policy else 0
    if sink_policy:
        e_cos, e_sin = rope_cos_sin(plan.q_pos, cfg.head_dim, cfg.rope_theta)
    else:
        e_cos, e_sin = w_cos, w_sin      # write_pos == q_pos for these policies
    rope_tables = (w_cos, w_sin, e_cos, e_sin)

    # weights stay STACKED and closed over; the scan carries only the layer
    # index. Quantized matmuls take the index into their Pallas kernel via
    # scalar prefetch — scanning sliced weight copies into a pallas_call
    # measured 1.7x slower end-to-end (47.9 vs 80.9 scan fps on the 7B).
    #
    # The caches go through the layer loop as scan xs/ys (read this layer's
    # slice, emit the updated slice). A round-3 experiment rebuilt this as a
    # fori_loop CARRYING the stacked [L, ...] buffers with in-place
    # dynamic_update_slice writes (write_layer_stacked), on the theory that
    # the scan-ys formulation streams the whole ~2 GB cache every decode
    # pass. MEASURED NEGATIVE, twice, on the v5e-1 7B B=8 decode:
    #   * batched scatter into the stacked buffer: 44.8 tok/s vs 405.7 scan;
    #   * per-row DUS (the alias-friendly form): 45.4 tok/s — the compiled
    #     HLO shows 4 full-cache LAYOUT-CHANGING copies per layer iteration
    #     (the DUS write and the attention read want different tilings of
    #     the carried buffer, and XLA layout assignment transposes the
    #     whole [L,...] array each way, every layer).
    # A donated while-loop microbench additionally shows XLA aliases the
    # scan-ys formulation fully in place (cache machinery ~0 ms/step), so
    # there was no 8 ms to win back — that attribution was an artifact of
    # slope-timing write_layer standalone (non-donated => real copies).
    # AHA_CACHE_LOOP=fori (S==1 passes only) keeps the negative result
    # reproducible.
    lyr = params["layers"]

    # AHA_ABL: comma list of measurement-only knockouts for in-situ decode
    # attribution (each knocks one component out of the REAL compiled
    # program — results are wrong, timing deltas are honest):
    #   no_attn  — attention output := q (removes attention compute AND the
    #              cache read, keeps all shapes/deps),
    #   no_write — skip write_layer (attention reads the stale slice; the
    #              scan still emits ys, so only the scatter cost vanishes).
    # See also no_lmhead in lm_logits. scripts/perf/ab_int4_decode.py is
    # the harness: AHA_ABL=no_attn python ... --presets 7b-int8.
    abl = set(filter(None, os.environ.get("AHA_ABL", "").split(",")))

    def make_layer_fn(transient: str):
        def attend(x, i, q, k_c, v_c, ks_c, vs_c):
            if "no_attn" in abl:
                attn = q.astype(x.dtype)
            else:
                attn = cached_attention(
                    q, k_c, v_c, plan,
                    rope_theta=cfg.rope_theta, sink_slots=sink_slots,
                    sink_policy=sink_policy, mask_mode=policy.mask_mode,
                    evicting=policy.kind in ("sink", "sliding"),
                    transient=transient, rope_tables=rope_tables,
                    kv_scales=None if ks_c is None else (ks_c, vs_c))
            attn = attn.reshape(*x.shape[:2], cfg.q_dim)
            x = x + linear(attn, lyr["o_proj"], _layer_lora(lora, "o_proj"),
                           lora_scale, layer=i)
            h = rms_norm(x, _idx(lyr["post_norm"]["scale"], i), cfg.rms_norm_eps)
            return x + _mlp(h, lyr, lora, lora_scale, layer=i)

        def layer_fn(i, carry):
            x, k_all, v_all, ks_all, vs_all = carry
            h = rms_norm(x, _idx(lyr["input_norm"]["scale"], i), cfg.rms_norm_eps)
            q, k, v = _qkv(h, lyr, cfg, lora, lora_scale, layer=i)
            (k_all, v_all, ks_all, vs_all,
             k_c, v_c, ks_c, vs_c) = write_layer_stacked(
                k_all, v_all, i, k, v, plan, ks_all, vs_all,
                rot=(w_cos, w_sin))
            x = attend(x, i, q, k_c, v_c, ks_c, vs_c)
            return (x, k_all, v_all, ks_all, vs_all)

        def layer_fn_scan(x, scanned):
            k_cache_l, v_cache_l, ks_l, vs_l, i = scanned
            h = rms_norm(x, _idx(lyr["input_norm"]["scale"], i), cfg.rms_norm_eps)
            q, k, v = _qkv(h, lyr, cfg, lora, lora_scale, layer=i)
            if "no_write" in abl:
                k_c, v_c, ks_c, vs_c = k_cache_l, v_cache_l, ks_l, vs_l
                # keep k/v alive so their projections aren't DCE'd with them
                x = x + (0.0 * (k.sum() + v.sum())).astype(x.dtype)
            else:
                k_c, v_c, ks_c, vs_c = write_layer(k_cache_l, v_cache_l, k, v,
                                                   plan, ks_l, vs_l,
                                                   rot=(w_cos, w_sin))
            x = attend(x, i, q, k_c, v_c, ks_c, vs_c)
            return x, (k_c, v_c, ks_c, vs_c)

        return layer_fn, layer_fn_scan

    use_fori = os.environ.get("AHA_CACHE_LOOP", "scan") == "fori" and S == 1

    def run_scan(transient, x0):
        loop_fn, scan_fn = make_layer_fn(transient)
        if not use_fori:
            scanned = (cache.k, cache.v, cache.k_scale, cache.v_scale,
                       jnp.arange(cfg.num_layers, dtype=jnp.int32))
            return jax.lax.scan(scan_fn, x0, scanned)
        x, new_k, new_v, new_ks, new_vs = jax.lax.fori_loop(
            0, cfg.num_layers, loop_fn,
            (x0, cache.k, cache.v, cache.k_scale, cache.v_scale))
        return x, (new_k, new_v, new_ks, new_vs)

    if policy.kind == "sink":
        # ONE chunk-level cond around the whole layer scan: during the fill
        # transient (at most one window per stream, once) every layer runs
        # the exact rotate-at-read attention; everywhere else the zero-cost
        # pre-rotation fast path. A per-layer cond instead measured ~7%
        # scan / ~15% decode overhead on v5e-1 even with the fast branch
        # always taken (attention.transient_deviation docstring).
        needs_exact = jnp.any(attention.transient_deviation(plan, sink_slots))
        x, (new_k, new_v, new_ks, new_vs) = jax.lax.cond(
            needs_exact,
            lambda x0: run_scan("exact", x0),
            lambda x0: run_scan("fast", x0),
            inputs_embeds,
        )
    else:
        x, (new_k, new_v, new_ks, new_vs) = run_scan("fast", inputs_embeds)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    new_cache = advance(cache, plan, new_k, new_v, new_ks, new_vs)
    return x, new_cache


def decode_chunk_spec(
    params: dict,
    cfg: QwenConfig,
    policy: CachePolicy,
    cache: KVCache,
    inputs_embeds: jnp.ndarray,   # [B, S, H] — carried token + drafts
    plans,                        # ops.spec_decode.SpecPlans (composed)
    *,
    lora: dict | None = None,
    lora_scale: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Speculative VERIFY pass: like `decode_chunk`, but bit-equal to S
    sequential 1-token passes (the reference's greedy loop semantics) and
    READ-ONLY on the cache.

    Draft K/V never touch the cache — each layer emits its pre-rotated
    in-flight block instead (scan ys), and `speculative_attention` scores
    every chunk position exactly as the corresponding sequential step
    would (per-step composed masks/positions; see ops/spec_decode.py and
    the chunk-vs-sequential divergence probe in BASELINE.md round 3).
    Acceptance-gated commit happens afterwards via
    `spec_decode.commit_slots` + `select_meta`.

    Returns (final hidden [B, S, H], infl_k [L, B, S, KVH, Dh] pre-rotated
    at plans.write_pos, infl_v [L, B, S, KVH, Dh]).

    Like decode_chunk, a single chunk-level cond around the layer scan
    picks the fast pre-rotation scoring or (sink policy, `plans.exact`)
    the reference rotate-at-read branch — which here costs ONE cache
    rotation per verify pass instead of one per decoded token, so
    speculation also amortizes the post-fill exact-path tax the plain
    loop pays (BASELINE.md round 3).
    """
    from aha_tpu.ops.rope import apply_rope as _apply_rope

    sink_policy = policy.kind == "sink"
    sink_slots = policy.num_sink if sink_policy else 0
    w_cos, w_sin = rope_cos_sin(plans.write_pos, cfg.head_dim, cfg.rope_theta)
    if sink_policy:
        e_cos, e_sin = rope_cos_sin(plans.q_pos, cfg.head_dim, cfg.rope_theta)
        x_cos, x_sin = rope_cos_sin(plans.qx, cfg.head_dim, cfg.rope_theta)
    else:
        e_cos, e_sin = w_cos, w_sin
        x_cos, x_sin = w_cos, w_sin
    rope_tables = (w_cos, w_sin, e_cos, e_sin, x_cos, x_sin)
    lyr = params["layers"]

    def make_scan_fn(exact: bool):
        def scan_fn(x, scanned):
            k_cache_l, v_cache_l, ks_l, vs_l, i = scanned
            h = rms_norm(x, _idx(lyr["input_norm"]["scale"], i), cfg.rms_norm_eps)
            q, k, v = _qkv(h, lyr, cfg, lora, lora_scale, layer=i)
            k_rot = _apply_rope(k.astype(jnp.float32), w_cos, w_sin).astype(k.dtype)
            attn = attention.speculative_attention(
                q, k_cache_l, v_cache_l, k_rot, v, plans,
                rope_theta=cfg.rope_theta, sink_slots=sink_slots,
                sink_policy=sink_policy, rope_tables=rope_tables,
                kv_scales=None if ks_l is None else (ks_l, vs_l),
                exact=exact)
            attn = attn.reshape(*x.shape[:2], cfg.q_dim)
            x = x + linear(attn, lyr["o_proj"], _layer_lora(lora, "o_proj"),
                           lora_scale, layer=i)
            h = rms_norm(x, _idx(lyr["post_norm"]["scale"], i), cfg.rms_norm_eps)
            x = x + _mlp(h, lyr, lora, lora_scale, layer=i)
            return x, (k_rot, v)
        return scan_fn

    scanned = (cache.k, cache.v, cache.k_scale, cache.v_scale,
               jnp.arange(cfg.num_layers, dtype=jnp.int32))
    if sink_policy:
        x, (infl_k, infl_v) = jax.lax.cond(
            plans.exact,
            lambda x0: jax.lax.scan(make_scan_fn(True), x0, scanned),
            lambda x0: jax.lax.scan(make_scan_fn(False), x0, scanned),
            inputs_embeds)
    else:
        x, (infl_k, infl_v) = jax.lax.scan(make_scan_fn(False),
                                           inputs_embeds, scanned)
    x = rms_norm(x, params["final_norm"]["scale"], cfg.rms_norm_eps)
    return x, infl_k, infl_v


# ---------------------------------------------------------------------------
# Embedding / logits
# ---------------------------------------------------------------------------


def embed_tokens(params: dict, input_ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    w = params["embed"]["weight"]
    if isinstance(w, dict):  # int8 table: gather rows + per-row scales
        rows = w["qvalue"][input_ids].astype(jnp.float32) * w["scale"][input_ids]
        return rows.astype(dtype)
    return w[input_ids]


def lm_logits(params: dict, cfg: QwenConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    if "no_lmhead" in os.environ.get("AHA_ABL", ""):
        # measurement-only knockout (see decode_chunk): shape-preserving
        # fake logits that keep the trunk alive but skip the [H, V] matmul
        return jnp.broadcast_to(hidden.sum(-1, keepdims=True),
                                (*hidden.shape[:-1], cfg.vocab_size))
    if cfg.tie_word_embeddings:
        w = params["embed"]["weight"]
        if isinstance(w, dict):
            w = (w["qvalue"].astype(jnp.float32) * w["scale"]).astype(hidden.dtype)
        return jnp.einsum("...h,vh->...v", hidden, w)
    k = params["lm_head"]["kernel"]
    if isinstance(k, dict):
        from aha_tpu.ops.quant import qlinear

        return qlinear(hidden, k)
    return jnp.einsum("...h,hv->...v", hidden, k)

"""Weight-only int8 quantization for single-chip inference.

The TPU-native equivalent of the reference's bitsandbytes NF4 path
(`/root/reference/models/modeling_live.py:114-133`): per-output-channel
symmetric int8 over every matmul kernel + the embedding table, dequantized
at apply time (absmax/127 scale). Halves HBM for the 7B (bf16 15.8 GB ->
~8.2 GB) so it fits a 16 GB v5e-1 with room for the KV cache — the memory
plan called out in SURVEY §7 ("7B weights + cache on small-HBM chips").

A quantized kernel is a dict {"qvalue": int8[..., out], "scale": f32[out]}
recognized by the dequant helpers that the model matmul sites call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_array(w: jnp.ndarray, contract_axis: int) -> dict:
    """Symmetric int8 with one scale per slice along `contract_axis` (the
    axis reduced by the matmul): [in,out] -> scale [1,out]; stacked
    [L,in,out] -> scale [L,1,out] (never shared across layers)."""
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=contract_axis, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"qvalue": q, "scale": scale.astype(jnp.float32)}


def is_quantized(p) -> bool:
    return isinstance(p, dict) and ("qvalue" in p or "q4value" in p)


# ---------------------------------------------------------------------------
# int4 (group-wise, packed two nibbles per byte)
# ---------------------------------------------------------------------------


def quantize_array_int4(w: jnp.ndarray, contract_axis: int, group: int = 128) -> dict:
    """Symmetric int4 with one scale per (group of `group` contraction rows,
    output channel). Values in [-8, 7] stored offset-by-8 in [0, 15], packed
    two per uint8 along the contraction axis. Memory = K*N/2 bytes + bf16
    group scales — the 7B decoder drops to ~4.2 GB."""
    wf = jnp.moveaxis(w.astype(jnp.float32), contract_axis, -2)  # [.., K, N]
    *lead, K, N = wf.shape
    assert K % group == 0 and K % 2 == 0, (K, group)
    grouped = wf.reshape(*lead, K // group, group, N)
    absmax = jnp.max(jnp.abs(grouped), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax / 7.0, 1e-12)                  # [.., K/G, 1, N]
    q = jnp.clip(jnp.round(grouped / scale), -8, 7) + 8       # [0, 15]
    assert contract_axis % w.ndim == w.ndim - 2, \
        "int4 kernels must contract on axis -2 (the [.., K, N] layout)"
    q = q.astype(jnp.uint8).reshape(*lead, K, N)
    packed = (q[..., 0::2, :] | (q[..., 1::2, :] << 4))       # [.., K/2, N]
    # no scalar metadata in the tree (it must scan/tree_map cleanly):
    # K = 2 * packed.shape[-2], group = K // scale4.shape[-2]
    return {
        "q4value": packed,
        "scale4": scale.squeeze(-2).astype(jnp.bfloat16),     # [.., K/G, N]
    }


def dequantize_int4(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    packed = p["q4value"]
    *lead, Kh, N = packed.shape
    K = Kh * 2
    G = K // p["scale4"].shape[-2]
    low = (packed & 0xF).astype(jnp.int8) - 8
    high = (packed >> 4).astype(jnp.int8) - 8
    q = jnp.stack([low, high], axis=-2)                       # [.., K/2, 2, N]
    q = q.reshape(*lead, K, N).astype(jnp.float32)
    scale = p["scale4"].astype(jnp.float32)                   # [.., K/G, N]
    q = q.reshape(*lead, K // G, G, N) * scale[..., :, None, :]
    return q.reshape(*lead, K, N).astype(dtype)


def dequantize(p: dict, dtype=jnp.bfloat16) -> jnp.ndarray:
    return (p["qvalue"].astype(jnp.float32) * p["scale"]).astype(dtype)


def resolve_kernel(kernel, dtype=None):
    """Kernel site helper: pass through dense kernels, dequantize q-kernels."""
    if is_quantized(kernel):
        return dequantize(kernel, dtype or jnp.bfloat16)
    return kernel if dtype is None else kernel.astype(dtype)


# trace-time override: GSPMD-partitioned (mesh-sharded) programs cannot
# auto-partition a pallas_call, so the sharded engine forces the jnp paths
# while ITS functions trace (StreamEngine._build)
_FORCE_BACKEND: str | None = None


def matmul_backend() -> str:
    """AHA_QUANT_MATMUL selects the quantized-matmul backend:

    * ``auto`` (default) — per-dtype, from in-context v5e-1 measurements:
      int4 -> the fused Pallas kernel (XLA's nibble-unpack path round-trips
      f32 through HBM: 2.9 ms vs 0.184 ms fused at M=64 K=3584 N=18944);
      int8 -> XLA dequant-einsum (in the full decoder scan XLA's scheduler
      prefetches the next layer's weights across op boundaries and wins
      84.5 vs 58.1 scan-fps, even though the ISOLATED fused kernel runs at
      the HBM roofline, 0.083 ms = 817 GB/s vs XLA's 0.317 ms — custom
      calls serialize against neighboring ops).
    * ``fused`` — force the fused Pallas kernels for int8 too.
    * ``fused_a8`` — fused kernels with per-token int8 activations
      (W8A8/W4A8 recipe, int8 MXU; ~1% relative hidden-state error).
    * ``jnp`` — XLA dequantize-then-einsum everywhere.
    * ``w8a8`` — the XLA-level dynamic-activation recipe (qlinear_w8a8).
    * ``pallas`` — the round-1 int8 kernel (kept for comparison).
    """
    import os

    if _FORCE_BACKEND is not None:
        return _FORCE_BACKEND
    return os.environ.get("AHA_QUANT_MATMUL", "auto")


def _fused_ok(K: int, N: int, group: int | None = None) -> bool:
    import jax

    from aha_tpu.ops.pallas.fused_matmul import fused_compatible

    return (jax.default_backend() in ("tpu", "axon")
            and fused_compatible(K, N, group))


def use_pallas_matmul() -> bool:
    return matmul_backend() == "pallas"


def use_w8a8() -> bool:
    return matmul_backend() == "w8a8"


def qlinear_w8a8(x: jnp.ndarray, qkernel: dict) -> jnp.ndarray:
    """Dynamic per-token activation quantization + int8 x int8 matmul.

    The v5e MXU runs int8 at 2x the bf16 rate and the weight never leaves
    int8, so there is no dequant conversion at all:

        x_q = round(x / s_x),  s_x = absmax(x, last axis) / 127
        y   = (x_q @ w_q) * s_x * s_w        (int32 accumulate)

    Accuracy: per-token activation scales keep the quantization error of
    the standard W8A8 recipe (~1% relative on hidden states).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s_x = jnp.maximum(absmax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127).astype(jnp.int8)
    acc = jnp.einsum("...k,kn->...n", xq, qkernel["qvalue"],
                     preferred_element_type=jnp.int32)
    w_scale = qkernel["scale"].reshape(-1)[None, :]          # [1, N]
    y = acc.astype(jnp.float32) * s_x * w_scale
    return y.astype(x.dtype)


def qlinear(x: jnp.ndarray, qkernel: dict, layer=None) -> jnp.ndarray:
    """x [..., K] times a quantized kernel ({qvalue [K, N], scale} int8 or
    {q4value, scale4} packed int4). Backend per AHA_QUANT_MATMUL (see
    matmul_backend).

    layer: optional traced int — qkernel leaves are layer-stacked
    ([L, ...]) and this layer is selected. The fused Pallas kernels take
    the index via scalar prefetch (no weight-slice copy inside a scan);
    fallback backends take a dynamic slice."""
    backend = matmul_backend()
    if "q4value" in qkernel:
        Kh, N = qkernel["q4value"].shape[-2:]
        group = 2 * Kh // qkernel["scale4"].shape[-2]
        if (backend in ("auto", "fused", "fused_a8")
                and _fused_ok(2 * Kh, N, group)):
            if backend == "fused_a8":
                from aha_tpu.ops.pallas.fused_matmul import int4_matmul

                return int4_matmul(x, qkernel["q4value"], qkernel["scale4"],
                                   layer, a8=True)
            # custom-VJP wrapper: same forward kernel, and dL/dx routes
            # through the transposed unpack-matmul — this is what makes an
            # int4 trunk trainable (QLoRA needs no dW for frozen weights)
            from aha_tpu.ops.pallas.fused_matmul import int4_qlinear

            return int4_qlinear(x, qkernel["q4value"], qkernel["scale4"],
                                layer)
        qkernel = _sliced(qkernel, layer)
        kernel = dequantize_int4(qkernel, x.dtype)
        return jnp.einsum("...i,io->...o", x, kernel)
    K, N = qkernel["qvalue"].shape[-2:]
    if backend in ("fused", "fused_a8") and _fused_ok(K, N):
        from aha_tpu.ops.pallas.fused_matmul import int8_matmul

        return int8_matmul(x, qkernel["qvalue"], qkernel["scale"],
                           layer, a8=backend == "fused_a8")
    qkernel = _sliced(qkernel, layer)
    if use_w8a8():
        return qlinear_w8a8(x, qkernel)
    if use_pallas_matmul():
        from aha_tpu.ops.pallas.quant_matmul import quant_matmul

        return quant_matmul(x, qkernel["qvalue"], qkernel["scale"])
    kernel = dequantize(qkernel, x.dtype)
    return jnp.einsum("...i,io->...o", x, kernel)


def _sliced(qkernel: dict, layer) -> dict:
    if layer is None:
        return qkernel
    import jax

    return {k: jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
            for k, v in qkernel.items()}


_QUANT_KEYS = ("kernel", "weight")
# param subtrees that stay dense: tiny, precision-sensitive, or gathered
_SKIP_SUBSTRINGS = ("norm", "ln1", "ln2", "post_ln", "bias", "scale", "pos_embed",
                    "heads", "patch_embed")


def quantize_params(params: dict, *, quantize_embed: bool = True,
                    bits: int = 8, group: int = 128,
                    quantize_vision: bool = False,
                    keep_dense: tuple[str, ...] = ()) -> dict:
    """Quantize every large matmul kernel in an Aha param tree.

    bits=8: per-channel int8 (default). bits=4: group-wise packed int4 for
    matmul kernels (embedding tables stay int8 — the gather path).
    Embedding tables quantize along the hidden axis (per-row scales).

    quantize_vision=False (default): the SigLIP tower stays dense — it is
    compute-bound (weights are read once per 32-frame batch, ~0.6 GB bf16),
    so int8 there only adds dequant conversions to the per-frame hot path
    (measured: vision-inclusive scoring 38 -> 6x faster tower dense).

    keep_dense: path substrings to leave unquantized. QLoRA-style training
    needs the densely-trained finetune modules kept bf16/f32:
    ``keep_dense=("projector", "lm_head")`` (heads are already skipped).
    """
    assert bits in (4, 8), bits

    def visit(path, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        joined = "/".join(keys)
        if not quantize_vision and keys and keys[0] == "vision":
            return leaf
        if any(s in joined for s in _SKIP_SUBSTRINGS + tuple(keep_dense)):
            return leaf
        if keys[-1] not in _QUANT_KEYS:
            return leaf
        if keys[-1] == "weight":  # embedding table [V, H]
            if not quantize_embed:
                return leaf
            return quantize_array(leaf, contract_axis=1)  # per-row scales
        if leaf.ndim < 2:
            return leaf
        if bits == 4:
            K = leaf.shape[-2]
            g = group if K % group == 0 else K  # tiny configs: one group
            if K % 2 == 0:
                return quantize_array_int4(leaf, contract_axis=leaf.ndim - 2, group=g)
        return quantize_array(leaf, contract_axis=leaf.ndim - 2)

    return jax.tree_util.tree_map_with_path(visit, params)


def tree_nbytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(tree))


def _concat_qkernels(kernels: list, biases: list | None):
    """Concatenate quantized (or dense) kernels along the output axis."""
    k0 = kernels[0]
    if is_quantized(k0):
        if "q4value" in k0:
            merged = {
                "q4value": jnp.concatenate([k["q4value"] for k in kernels], axis=-1),
                "scale4": jnp.concatenate([k["scale4"] for k in kernels], axis=-1),
            }
        else:
            merged = {
                "qvalue": jnp.concatenate([k["qvalue"] for k in kernels], axis=-1),
                "scale": jnp.concatenate([k["scale"] for k in kernels], axis=-1),
            }
    else:
        merged = jnp.concatenate(kernels, axis=-1)
    out = {"kernel": merged}
    if biases is not None:
        out["bias"] = jnp.concatenate(biases, axis=-1)
    return out


def merge_decoder_projections(llm_params: dict) -> dict:
    """Fuse q/k/v -> qkv_proj and gate/up -> gate_up_proj along the output
    axis (one Pallas call instead of three/two — each pallas_call carries
    ~10 us of fixed dispatch+glue cost, and the 7B decode runs 196 matmul
    calls per frame without merging). The decode path (qwen2._qkv/_mlp)
    splits the outputs; per-projection LoRA still applies on the slices.

    Returns a new llm param tree; the original is unchanged (callers drop
    it — transient HBM overlap is the merged copies only)."""
    lyr = dict(llm_params["layers"])
    qkv = _concat_qkernels(
        [lyr.pop("q_proj")["kernel"], lyr.pop("k_proj")["kernel"],
         lyr.pop("v_proj")["kernel"]],
        None,
    )
    # biases live next to the original kernels
    b = [llm_params["layers"][n].get("bias") for n in ("q_proj", "k_proj", "v_proj")]
    if all(x is not None for x in b):
        qkv["bias"] = jnp.concatenate(b, axis=-1)
    gate_up = _concat_qkernels(
        [lyr.pop("gate_proj")["kernel"], lyr.pop("up_proj")["kernel"]], None)
    lyr["qkv_proj"] = qkv
    lyr["gate_up_proj"] = gate_up
    return {**llm_params, "layers": lyr}

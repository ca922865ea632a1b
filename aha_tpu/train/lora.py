"""LoRA adapters for the scan-stacked Qwen2 decoder.

Reference uses peft LoRA r16/alpha32 over q/k/v/o/gate/up/down projections
with mm_projector + lm_head + 3 score heads trained densely
(`/root/reference/models/modeling_live.py:148-168`,
`/root/reference/models/arguments_live.py:15-18`).

TPU-first shape: one adapter pair per projection, stacked on the layer axis
like the base weights — `{proj: {"a": [L, in, r], "b": [L, r, out]}}` — so
the same ``lax.scan`` traverses base + adapters together and FSDP/TP
shardings apply unchanged. The delta is applied at matmul time (never
materializing W + BA; see `qwen2.linear`), with effective scale alpha/r.

Merging for export produces reference-compatible dense deltas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aha_tpu.config import LoraConfig, QwenConfig

LORA_PROJS = ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj")


def proj_dims(cfg: QwenConfig) -> dict[str, tuple[int, int]]:
    H, I, QD, KD = cfg.hidden_size, cfg.intermediate_size, cfg.q_dim, cfg.kv_dim
    return {
        "q_proj": (H, QD),
        "k_proj": (H, KD),
        "v_proj": (H, KD),
        "o_proj": (QD, H),
        "gate_proj": (H, I),
        "up_proj": (H, I),
        "down_proj": (I, H),
    }


def init_lora(cfg: QwenConfig, lora_cfg: LoraConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """A ~ kaiming-uniform (peft default), B = 0 so the initial delta is 0.

    Projections are selected by ``lora_cfg.target_patterns`` (the
    reference's `lora_modules` regex, arguments_live.py:15; the default
    matches all seven decoder projections)."""
    import re

    tree = {}
    L = cfg.num_layers
    r = lora_cfg.r
    pattern = re.compile(lora_cfg.target_patterns)
    keys = jax.random.split(key, len(LORA_PROJS))
    for k, (name, (din, dout)) in zip(keys, proj_dims(cfg).items()):
        if not pattern.search(f"layers_0/{name}/kernel"):
            continue
        bound = (6.0 / din) ** 0.5  # kaiming_uniform(a=sqrt(5)) on [r, din]
        tree[name] = {
            "a": jax.random.uniform(k, (L, din, r), dtype, -bound, bound),
            "b": jnp.zeros((L, r, dout), dtype),
        }
    return tree


def lora_scale(lora_cfg: LoraConfig) -> float:
    return lora_cfg.alpha / lora_cfg.r


def merge_lora(llm_params: dict, lora: dict, scale: float) -> dict:
    """Fold adapters into dense kernels (export / fast frozen inference)."""
    merged = jax.tree_util.tree_map(lambda x: x, llm_params)  # shallow-ish copy
    layers = dict(merged["layers"])
    for name, ab in lora.items():
        p = dict(layers[name])
        delta = jnp.einsum("lir,lro->lio", ab["a"], ab["b"]) * scale
        p["kernel"] = p["kernel"] + delta.astype(p["kernel"].dtype)
        layers[name] = p
    merged["layers"] = layers
    return merged


# ---------------------------------------------------------------------------
# Trainable-parameter partition
# ---------------------------------------------------------------------------


def trainable_labels(params: dict, lora: dict | None, finetune_modules: tuple[str, ...]) -> dict:
    """'train'/'freeze' label pytree over {"model": params, "lora": lora}
    for optax.multi_transform.

    Mirrors the reference's peft setup: adapters always train; of the base
    params only `finetune_modules` (projector, lm_head, score heads) do;
    the vision tower and decoder trunk stay frozen
    (ref modules_to_save, modeling_live.py:156-163; vision freeze at
    video_head_live_llava_qwen.py:370-374).
    """

    head_names = {
        "informative": "informative_head",
        "relevance": "relevance_head",
        "uncertainty": "uncertainty_head",
    }

    def label(path_tuple, leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path_tuple]
        if keys[0] == "projector" and "mm_projector" in finetune_modules:
            return "train"
        if keys[0] == "llm" and keys[1] == "lm_head" and "lm_head" in finetune_modules:
            return "train"
        if keys[0] == "heads" and head_names.get(keys[1]) in finetune_modules:
            return "train"
        return "freeze"

    model_labels = jax.tree_util.tree_map_with_path(label, params)
    out = {"model": model_labels}
    if lora is not None:
        out["lora"] = jax.tree_util.tree_map(lambda _: "train", lora)
    return out

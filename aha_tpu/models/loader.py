"""Checkpoint conversion: HF torch state dicts -> aha_tpu param pytrees.

The reference loads `lmms-lab/llava-onevision-qwen2-7b-ov` + LoRA adapters
through transformers/peft (`/root/reference/models/modeling_live.py:96-181`).
Here conversion is explicit and offline: torch tensors come in [out, in]
layout and are transposed to our [in, out] right-multiplication layout;
per-layer tensors are stacked on a leading L axis for the scan.

Entry points:
  * convert_qwen2 / convert_siglip / convert_projector_heads — from a
    state-dict-like mapping (str -> numpy array),
  * load_params — from a directory of .safetensors / torch .bin shards,
  * save_converted / load_converted — orbax round-trip of converted trees.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from aha_tpu.config import AhaConfig, QwenConfig, SiglipConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        return x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def _stack(sd: dict, template: str, n: int, transpose: bool = False):
    arrs = []
    for i in range(n):
        a = _np(sd[template.format(i=i)])
        arrs.append(a.T if transpose else a)
    return np.stack(arrs)


def convert_qwen2(sd: dict, cfg: QwenConfig, prefix: str = "model.", dtype=jnp.float32) -> dict:
    """state dict -> qwen2 param tree. `prefix` covers nesting differences
    (e.g. 'model.' for a bare Qwen2ForCausalLM, 'language_model.model.' in
    composite checkpoints)."""
    L = cfg.num_layers
    p = prefix
    lyr = p + "layers.{i}."
    layers = {
        "input_norm": {"scale": _stack(sd, lyr + "input_layernorm.weight", L)},
        "q_proj": {
            "kernel": _stack(sd, lyr + "self_attn.q_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.q_proj.bias", L),
        },
        "k_proj": {
            "kernel": _stack(sd, lyr + "self_attn.k_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.k_proj.bias", L),
        },
        "v_proj": {
            "kernel": _stack(sd, lyr + "self_attn.v_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.v_proj.bias", L),
        },
        "o_proj": {"kernel": _stack(sd, lyr + "self_attn.o_proj.weight", L, transpose=True)},
        "post_norm": {"scale": _stack(sd, lyr + "post_attention_layernorm.weight", L)},
        "gate_proj": {"kernel": _stack(sd, lyr + "mlp.gate_proj.weight", L, transpose=True)},
        "up_proj": {"kernel": _stack(sd, lyr + "mlp.up_proj.weight", L, transpose=True)},
        "down_proj": {"kernel": _stack(sd, lyr + "mlp.down_proj.weight", L, transpose=True)},
    }
    out = {
        "embed": {"weight": _np(sd[p + "embed_tokens.weight"])},
        "layers": layers,
        "final_norm": {"scale": _np(sd[p + "norm.weight"])},
    }
    if not cfg.tie_word_embeddings:
        out["lm_head"] = {"kernel": _np(sd["lm_head.weight"]).T}
    return _cast(out, dtype)


def convert_siglip(sd: dict, cfg: SiglipConfig, prefix: str = "vision_model.", dtype=jnp.float32) -> dict:
    L = cfg.num_layers
    p = prefix
    lyr = p + "encoder.layers.{i}."
    layers = {
        "ln1": {
            "scale": _stack(sd, lyr + "layer_norm1.weight", L),
            "bias": _stack(sd, lyr + "layer_norm1.bias", L),
        },
        "q_proj": {
            "kernel": _stack(sd, lyr + "self_attn.q_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.q_proj.bias", L),
        },
        "k_proj": {
            "kernel": _stack(sd, lyr + "self_attn.k_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.k_proj.bias", L),
        },
        "v_proj": {
            "kernel": _stack(sd, lyr + "self_attn.v_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.v_proj.bias", L),
        },
        "out_proj": {
            "kernel": _stack(sd, lyr + "self_attn.out_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.out_proj.bias", L),
        },
        "ln2": {
            "scale": _stack(sd, lyr + "layer_norm2.weight", L),
            "bias": _stack(sd, lyr + "layer_norm2.bias", L),
        },
        "fc1": {
            "kernel": _stack(sd, lyr + "mlp.fc1.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "mlp.fc1.bias", L),
        },
        "fc2": {
            "kernel": _stack(sd, lyr + "mlp.fc2.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "mlp.fc2.bias", L),
        },
    }
    patch_w = _np(sd[p + "embeddings.patch_embedding.weight"])  # [H, 3, P, P]
    out = {
        "patch_embed": {
            "kernel": patch_w.transpose(2, 3, 1, 0),  # -> HWIO
            "bias": _np(sd[p + "embeddings.patch_embedding.bias"]),
        },
        "pos_embed": _np(sd[p + "embeddings.position_embedding.weight"]),
        "layers": layers,
        "post_ln": {
            "scale": _np(sd[p + "post_layernorm.weight"]),
            "bias": _np(sd[p + "post_layernorm.bias"]),
        },
    }
    if p + "head.probe" in sd:
        # MAP probe head (pooler_output, used when frame_token_cls=True —
        # ref vision_live.py:28). torch nn.MultiheadAttention packs q/k/v
        # as in_proj_weight [3H, H]; split then transpose to [in, out].
        w = _np(sd[p + "head.attention.in_proj_weight"])
        b = _np(sd[p + "head.attention.in_proj_bias"])
        H = w.shape[1]
        out["head"] = {
            "probe": _np(sd[p + "head.probe"]).reshape(1, H),
            "q_proj": {"kernel": w[:H].T, "bias": b[:H]},
            "k_proj": {"kernel": w[H:2 * H].T, "bias": b[H:2 * H]},
            "v_proj": {"kernel": w[2 * H:].T, "bias": b[2 * H:]},
            "out_proj": {
                "kernel": _np(sd[p + "head.attention.out_proj.weight"]).T,
                "bias": _np(sd[p + "head.attention.out_proj.bias"]),
            },
            "ln": {
                "scale": _np(sd[p + "head.layernorm.weight"]),
                "bias": _np(sd[p + "head.layernorm.bias"]),
            },
            "fc1": {
                "kernel": _np(sd[p + "head.mlp.fc1.weight"]).T,
                "bias": _np(sd[p + "head.mlp.fc1.bias"]),
            },
            "fc2": {
                "kernel": _np(sd[p + "head.mlp.fc2.weight"]).T,
                "bias": _np(sd[p + "head.mlp.fc2.bias"]),
            },
        }
    return _cast(out, dtype)


def convert_clip(sd: dict, cfg: SiglipConfig, prefix: str = "vision_model.", dtype=jnp.float32) -> dict:
    """HF CLIPVisionModel state dict -> models/clip.py param tree
    (the reference's CLIP tower option, vision_live.py:34-64). CLIP's patch
    conv has no bias; CLS + pre-LN are extra vs SigLIP; post_layernorm is
    dropped (the reference consumes the un-normalized last_hidden_state)."""
    L = cfg.num_layers
    p = prefix
    lyr = p + "encoder.layers.{i}."
    layers = {
        "ln1": {
            "scale": _stack(sd, lyr + "layer_norm1.weight", L),
            "bias": _stack(sd, lyr + "layer_norm1.bias", L),
        },
        "q_proj": {
            "kernel": _stack(sd, lyr + "self_attn.q_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.q_proj.bias", L),
        },
        "k_proj": {
            "kernel": _stack(sd, lyr + "self_attn.k_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.k_proj.bias", L),
        },
        "v_proj": {
            "kernel": _stack(sd, lyr + "self_attn.v_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.v_proj.bias", L),
        },
        "out_proj": {
            "kernel": _stack(sd, lyr + "self_attn.out_proj.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "self_attn.out_proj.bias", L),
        },
        "ln2": {
            "scale": _stack(sd, lyr + "layer_norm2.weight", L),
            "bias": _stack(sd, lyr + "layer_norm2.bias", L),
        },
        "fc1": {
            "kernel": _stack(sd, lyr + "mlp.fc1.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "mlp.fc1.bias", L),
        },
        "fc2": {
            "kernel": _stack(sd, lyr + "mlp.fc2.weight", L, transpose=True),
            "bias": _stack(sd, lyr + "mlp.fc2.bias", L),
        },
    }
    patch_w = _np(sd[p + "embeddings.patch_embedding.weight"])  # [H, 3, P, P]
    out = {
        "cls_embed": _np(sd[p + "embeddings.class_embedding"]),
        "patch_embed": {"kernel": patch_w.transpose(2, 3, 1, 0)},  # -> HWIO
        "pos_embed": _np(sd[p + "embeddings.position_embedding.weight"]),
        "pre_ln": {
            "scale": _np(sd[p + "pre_layrnorm.weight"]),
            "bias": _np(sd[p + "pre_layrnorm.bias"]),
        },
        "layers": layers,
    }
    return _cast(out, dtype)


def convert_projector_heads(sd: dict, dtype=jnp.float32) -> tuple[dict, dict]:
    """mm_projector (Sequential Linear/GELU/Linear) + three score heads
    (ref keys: model.mm_projector.{0,2}.*, {informative,relevance,uncertainty}_head.weight)."""
    projector = {
        "fc1": {
            "kernel": _np(sd["model.mm_projector.0.weight"]).T,
            "bias": _np(sd["model.mm_projector.0.bias"]),
        },
        "fc2": {
            "kernel": _np(sd["model.mm_projector.2.weight"]).T,
            "bias": _np(sd["model.mm_projector.2.bias"]),
        },
    }
    heads = {
        "informative": {"kernel": _np(sd["informative_head.weight"]).T},
        "relevance": {"kernel": _np(sd["relevance_head.weight"]).T},
        "uncertainty": {"kernel": _np(sd["uncertainty_head.weight"]).T},
    }
    return _cast(projector, dtype), _cast(heads, dtype)


def _cast(tree, dtype):
    import jax

    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree)


def convert_peft_lora(sd: dict, cfg: QwenConfig, dtype=jnp.float32) -> dict:
    """peft LoRA adapter state dict -> our stacked lora tree.

    The reference publishes adapter-only checkpoints
    (`/root/reference/models/modeling_live.py:149-151`); peft keys look like
    `base_model.model.model.layers.{i}.self_attn.q_proj.lora_A.weight`
    ([r, in]) / `...lora_B.weight` ([out, r]). Ours: a [L, in, r],
    b [L, r, out].
    """
    projs = {
        "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }
    # locate the per-layer prefix (varies with wrapping depth)
    sample = next((k for k in sd if ".lora_A." in k and "layers.0." in k), None)
    assert sample is not None, "no lora_A keys found"
    prefix = sample.split("layers.0.")[0]
    tree = {}
    for name, hf_name in projs.items():
        a_tmpl = prefix + "layers.{i}." + hf_name + ".lora_A.weight"
        b_tmpl = prefix + "layers.{i}." + hf_name + ".lora_B.weight"
        if a_tmpl.format(i=0) not in sd:
            continue
        a = _stack(sd, a_tmpl, cfg.num_layers, transpose=True)   # [L, in, r]
        b = _stack(sd, b_tmpl, cfg.num_layers, transpose=True)   # [L, r, out]
        tree[name] = {"a": jnp.asarray(a, dtype), "b": jnp.asarray(b, dtype)}
    return tree


def convert_peft_modules_to_save(sd: dict, dtype=jnp.float32) -> dict:
    """Dense modules saved alongside the adapters (mm_projector, heads,
    lm_head — ref modules_to_save, modeling_live.py:156-163). Returns
    partial param overrides keyed like AhaParams."""
    def find(suffix):
        for k in sd:
            if k.endswith(suffix):
                return _np(sd[k])
        return None

    out: dict = {}
    proj0 = find("mm_projector.0.weight")
    if proj0 is not None:
        out["projector"] = {
            "fc1": {"kernel": proj0.T, "bias": find("mm_projector.0.bias")},
            "fc2": {"kernel": find("mm_projector.2.weight").T,
                    "bias": find("mm_projector.2.bias")},
        }
    heads = {}
    for name in ("informative", "relevance", "uncertainty"):
        w = find(f"{name}_head.weight")
        if w is not None:
            heads[name] = {"kernel": w.T}
    if heads:
        out["heads"] = heads
    lm = find("lm_head.weight")
    if lm is not None:
        out["llm"] = {"lm_head": {"kernel": lm.T}}
    return _cast(out, dtype)


def load_adapter(path: str, cfg: AhaConfig, dtype=jnp.float32):
    """Load a peft adapter-only checkpoint directory (the reference's
    published artifact, `modeling_live.py:149-151`): returns
    (lora_tree, overrides, lora_scale).

    lora_scale = alpha / r from `adapter_config.json` when present
    (peft writes it next to the weights); falls back to the reference's
    r16/alpha32 ratio."""
    import json

    sd = _read_state_dict(path)
    lora = convert_peft_lora(sd, cfg.llm, dtype=dtype)
    overrides = convert_peft_modules_to_save(sd, dtype=dtype)
    scale = 32.0 / 16.0
    cfg_path = os.path.join(path, "adapter_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            ac = json.load(f)
        if ac.get("r"):
            scale = float(ac.get("lora_alpha", 2 * ac["r"])) / float(ac["r"])
    return lora, overrides, scale


def apply_overrides(params: dict, overrides: dict) -> dict:
    """Deep-merge partial param overrides into a full tree."""
    out = dict(params)
    for k, v in overrides.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict) and "kernel" not in v \
                and "weight" not in v and "a" not in v:
            out[k] = apply_overrides(out[k], v)
        else:
            out[k] = v
    return out


def export_hf_state_dict(params: dict, cfg: AhaConfig,
                         vis_prefix: str =
                         "model.vision_tower.vision_tower.vision_model.",
                         ) -> dict:
    """AhaParams -> HF/reference-style numpy state dict (the exact inverse
    of convert_qwen2/convert_siglip/convert_projector_heads): [in, out]
    kernels transpose back to torch [out, in], scan-stacked layers unstack
    to per-layer keys. Used to (a) export trained models back to the
    reference ecosystem and (b) synthesize format-faithful checkpoints for
    the REAL_WEIGHTS runbook rehearsal (scripts/make_synthetic_hf_checkpoint
    .py). vis_prefix defaults to the real llava-onevision nesting
    (ref `models/modeling_live.py:96-140` wraps the tower twice)."""
    sd: dict = {}
    llm = params["llm"]
    L = cfg.llm.num_layers
    A = np.asarray
    sd["model.embed_tokens.weight"] = A(llm["embed"]["weight"])
    sd["model.norm.weight"] = A(llm["final_norm"]["scale"])
    if "lm_head" in llm:
        sd["lm_head.weight"] = A(llm["lm_head"]["kernel"]).T
    lyr = llm["layers"]
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = A(lyr["input_norm"]["scale"][i])
        sd[p + "post_attention_layernorm.weight"] = A(lyr["post_norm"]["scale"][i])
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[p + f"self_attn.{proj}.weight"] = A(lyr[proj]["kernel"][i]).T
            if "bias" in lyr[proj]:
                sd[p + f"self_attn.{proj}.bias"] = A(lyr[proj]["bias"][i])
        for proj in ("gate_proj", "up_proj", "down_proj"):
            sd[p + f"mlp.{proj}.weight"] = A(lyr[proj]["kernel"][i]).T
    vis = params["vision"]
    vp = vis_prefix
    sd[vp + "embeddings.patch_embedding.weight"] = A(
        vis["patch_embed"]["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in vis["patch_embed"]:
        sd[vp + "embeddings.patch_embedding.bias"] = A(vis["patch_embed"]["bias"])
    sd[vp + "embeddings.position_embedding.weight"] = A(vis["pos_embed"])
    if "post_ln" in vis:
        sd[vp + "post_layernorm.weight"] = A(vis["post_ln"]["scale"])
        sd[vp + "post_layernorm.bias"] = A(vis["post_ln"]["bias"])
    vmap = {"ln1": "layer_norm1", "ln2": "layer_norm2",
            "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj", "out_proj": "self_attn.out_proj",
            "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
    vl = vis["layers"]
    for i in range(cfg.vision.num_layers):
        for ours, theirs in vmap.items():
            p = vp + f"encoder.layers.{i}.{theirs}."
            if "kernel" in vl[ours]:
                sd[p + "weight"] = A(vl[ours]["kernel"][i]).T
            else:
                sd[p + "weight"] = A(vl[ours]["scale"][i])
            sd[p + "bias"] = A(vl[ours]["bias"][i])
    if "head" in vis:
        h = vis["head"]
        hp = vp + "head."
        sd[hp + "probe"] = A(h["probe"]).reshape(1, 1, -1)
        sd[hp + "attention.in_proj_weight"] = np.concatenate(
            [A(h["q_proj"]["kernel"]).T, A(h["k_proj"]["kernel"]).T,
             A(h["v_proj"]["kernel"]).T], axis=0)
        sd[hp + "attention.in_proj_bias"] = np.concatenate(
            [A(h["q_proj"]["bias"]), A(h["k_proj"]["bias"]),
             A(h["v_proj"]["bias"])], axis=0)
        sd[hp + "attention.out_proj.weight"] = A(h["out_proj"]["kernel"]).T
        sd[hp + "attention.out_proj.bias"] = A(h["out_proj"]["bias"])
        sd[hp + "layernorm.weight"] = A(h["ln"]["scale"])
        sd[hp + "layernorm.bias"] = A(h["ln"]["bias"])
        sd[hp + "mlp.fc1.weight"] = A(h["fc1"]["kernel"]).T
        sd[hp + "mlp.fc1.bias"] = A(h["fc1"]["bias"])
        sd[hp + "mlp.fc2.weight"] = A(h["fc2"]["kernel"]).T
        sd[hp + "mlp.fc2.bias"] = A(h["fc2"]["bias"])
    proj = params["projector"]
    sd["model.mm_projector.0.weight"] = A(proj["fc1"]["kernel"]).T
    sd["model.mm_projector.0.bias"] = A(proj["fc1"]["bias"])
    sd["model.mm_projector.2.weight"] = A(proj["fc2"]["kernel"]).T
    sd["model.mm_projector.2.bias"] = A(proj["fc2"]["bias"])
    for name in ("informative", "relevance", "uncertainty"):
        sd[f"{name}_head.weight"] = A(params["heads"][name]["kernel"]).T
    return sd


# ---------------------------------------------------------------------------
# File loading
# ---------------------------------------------------------------------------


def _read_state_dict(path: str) -> dict:
    """Load all tensors from a checkpoint dir (.safetensors preferred)."""
    sd: dict = {}
    files = sorted(os.listdir(path))
    st_files = [f for f in files if f.endswith(".safetensors")]
    bin_files = [f for f in files if f.endswith(".bin") or f.endswith(".pt")]
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(os.path.join(path, f), framework="np") as h:
                for key in h.keys():
                    sd[key] = h.get_tensor(key)
    elif bin_files:
        import torch

        for f in bin_files:
            sd.update(torch.load(os.path.join(path, f), map_location="cpu", weights_only=True))
    else:
        raise FileNotFoundError(f"no .safetensors/.bin shards in {path}")
    return sd


def load_params(path: str, cfg: AhaConfig, dtype=jnp.float32) -> dict:
    """Convert a full reference-style checkpoint directory into AhaParams."""
    sd = _read_state_dict(path)
    llm_prefix = "model." if "model.embed_tokens.weight" in sd else "language_model.model."
    vis_prefix = next(
        (k[: -len("embeddings.patch_embedding.weight")] for k in sd
         if k.endswith("embeddings.patch_embedding.weight")),
        "vision_model.",
    )
    convert_vision = convert_clip if cfg.vision.arch == "clip" else convert_siglip
    params = {
        "llm": convert_qwen2(sd, cfg.llm, prefix=llm_prefix, dtype=dtype),
        "vision": convert_vision(sd, cfg.vision, prefix=vis_prefix, dtype=dtype),
    }
    params["projector"], params["heads"] = convert_projector_heads(sd, dtype=dtype)
    return params


# ---------------------------------------------------------------------------
# Orbax round-trip for converted trees
# ---------------------------------------------------------------------------


def materialize_random_params(cfg: AhaConfig, mode: str | None = None,
                              keep_dense: tuple[str, ...] = ()) -> dict:
    """Materialize a synthetic param tree leaf-by-leaf DIRECTLY on device
    in its final (optionally quantized) dtype — the only way to stand up a
    7B on a 16 GB chip without real weights (a full-precision tree would
    not fit, and single-core CPU init + transfer takes minutes). Values
    are seeded per-leaf (deterministic across runs/processes — the chip7b
    golden fixture depends on this). mode: None (model dtype) | "int8" |
    "int4". keep_dense: top-level subtrees excluded from quantization
    (e.g. ("projector", "lm_head") for the QLoRA trunk layout).

    Used by bench.py, the perf harnesses, and `aha infer/serve
    --synthetic_weights` (the on-chip product-rehearsal path — ref has no
    analog; its benchmarks always load the published checkpoint)."""
    import jax

    from aha_tpu.models.aha import init_aha_params
    from aha_tpu.ops import quant

    struct = jax.eval_shape(lambda: init_aha_params(cfg, jax.random.PRNGKey(0)))
    if mode == "int8":
        struct = jax.eval_shape(
            lambda p: quant.quantize_params(p, keep_dense=keep_dense), struct)
    elif mode == "int4":
        struct = jax.eval_shape(
            lambda p: quant.quantize_params(p, bits=4, keep_dense=keep_dense),
            struct)
    counter = [0]

    def materialize(path, leaf):
        counter[0] += 1
        key = jax.random.PRNGKey(counter[0])
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.dtype == jnp.uint8:  # packed int4 nibbles
            make = jax.jit(lambda k: jax.random.randint(
                k, leaf.shape, 0, 256, jnp.int32).astype(jnp.uint8))
            return make(key)
        if name.endswith("/scale4"):
            return jnp.full(leaf.shape, 0.02 / 7.0, leaf.dtype)
        if leaf.dtype == jnp.int8:
            make = jax.jit(lambda k: jax.random.randint(
                k, leaf.shape, -127, 128, jnp.int32).astype(jnp.int8))
            return make(key)
        if name.endswith("/scale") and "norm" not in name and "ln" not in name:
            return jnp.full(leaf.shape, 0.02 / 127.0, leaf.dtype)
        if "norm" in name or "post_ln" in name or "/ln1/" in name or "/ln2/" in name:
            return jnp.ones(leaf.shape, leaf.dtype)
        if name.endswith("/bias"):
            return jnp.zeros(leaf.shape, leaf.dtype)
        make = jax.jit(lambda k: (0.02 * jax.random.normal(k, leaf.shape))
                       .astype(leaf.dtype))
        return make(key)

    import jax.tree_util as jtu

    return jtu.tree_map_with_path(materialize, struct)


def save_converted(params: dict, path: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), params)


def load_converted(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))

"""Synthesize a reduced-size but FORMAT-FAITHFUL llava-onevision artifact
set, so docs/REAL_WEIGHTS.md can be rehearsed end-to-end with no network
(VERDICT r4 next #6). Produces exactly what §1 of the runbook says a real
download contains:

  <out>/ov/       sharded bf16 .safetensors (+ model.safetensors.index.json)
                  with the reference's key layout — deep-nested vision tower
                  (`model.vision_tower.vision_tower.vision_model.*`, the
                  double wrap of ref models/modeling_live.py:96-140),
                  `model.layers.*` Qwen2 keys, `model.mm_projector.*`,
                  `*_head.weight` — plus config.json and a REAL byte-level
                  BPE fast tokenizer (tokenizer.json & friends, trained
                  in-process like tests/test_bpe_tokenizer.py).
  <out>/adapter/  a peft LoRA adapter dir: adapter_model.safetensors with
                  `base_model.model.model.layers.{i}...lora_A/B.weight`
                  keys + modules_to_save copies + adapter_config.json
                  (ref publishes exactly this shape, modeling_live.py:149-163).

The weights are the deterministic tiny-preset build (seed 0) with a seeded
random LoRA on top, so every runbook command is executable and its outputs
checkable. Usage:

    python scripts/make_synthetic_hf_checkpoint.py --out /tmp/aha_rehearsal
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

VOCAB = 2048          # >= the trained BPE's actual id range
LORA_R, LORA_ALPHA = 4, 8


def build_tiny():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from aha_tpu.config import aha_tiny
    from aha_tpu.models import aha

    cfg = aha_tiny(vocab_size=VOCAB)
    params, cfg, _ = aha.build_model_and_tokenizer(cfg, seed=0)
    return params, cfg


def write_tokenizer(out: pathlib.Path) -> None:
    """Train + save a real byte-level BPE fast tokenizer (the same
    machinery as Qwen2's — ref models/tokenization_live.py:115-131)."""
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    from aha_tpu.tokenization import BOS, EOS

    corpus = [
        "A multimodal AI assistant is helping users with some activities.",
        "Below is their conversation, interleaved with the list of video frames.",
        "What is happening in this video? The person is cooking rice.",
        "describe the highlight of this clip please",
        "the quick brown fox jumps over the lazy dog",
    ] * 20
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=700,
        special_tokens=[BOS, EOS, "<|endoftext|>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train_from_iterator(corpus, trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token=BOS, eos_token=EOS,
        pad_token="<|endoftext|>")
    fast.save_pretrained(str(out))


def write_sharded_safetensors(sd: dict, out: pathlib.Path) -> None:
    """Two bf16 shards + the HF index file, like a real multi-file
    checkpoint (`model-0000N-of-0000M.safetensors`)."""
    import ml_dtypes
    from safetensors.numpy import save_file

    sd = {k: np.ascontiguousarray(v.astype(ml_dtypes.bfloat16))
          for k, v in sd.items()}
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {"model-00001-of-00002.safetensors": keys[:half],
              "model-00002-of-00002.safetensors": keys[half:]}
    weight_map = {}
    total = 0
    for fname, ks in shards.items():
        save_file({k: sd[k] for k in ks}, str(out / fname))
        for k in ks:
            weight_map[k] = fname
            total += sd[k].nbytes
    (out / "model.safetensors.index.json").write_text(json.dumps({
        "metadata": {"total_size": total}, "weight_map": weight_map},
        indent=1))


def write_config_json(cfg, out: pathlib.Path) -> None:
    """A llava-ov-flavored config.json (the runbook requires the file to
    exist; aha_tpu configs come from presets, so only the documentary
    fields matter)."""
    (out / "config.json").write_text(json.dumps({
        "architectures": ["LlavaQwenForCausalLM"],
        "model_type": "llava_qwen",
        "hidden_size": cfg.llm.hidden_size,
        "intermediate_size": cfg.llm.intermediate_size,
        "num_hidden_layers": cfg.llm.num_layers,
        "num_attention_heads": cfg.llm.num_heads,
        "num_key_value_heads": cfg.llm.num_kv_heads,
        "vocab_size": cfg.llm.vocab_size,
        "rms_norm_eps": 1e-6,
        "rope_theta": cfg.llm.rope_theta,
        "torch_dtype": "bfloat16",
        "mm_vision_tower": "google/siglip-so400m-patch14-384",
        "mm_projector_type": "mlp2x_gelu",
        "image_aspect_ratio": "anyres_max_9",
    }, indent=1))


def write_adapter(params, cfg, out: pathlib.Path, seed: int = 7) -> None:
    """Seeded random peft LoRA (q/k/v/o/gate/up/down) + modules_to_save
    copies of mm_projector / score heads / lm_head — the reference's
    published adapter shape."""
    import ml_dtypes
    from safetensors.numpy import save_file

    rng = np.random.default_rng(seed)
    H = cfg.llm.hidden_size
    L = cfg.llm.num_layers
    dims = {
        "self_attn.q_proj": (H, cfg.llm.num_heads * cfg.llm.head_dim),
        "self_attn.k_proj": (H, cfg.llm.num_kv_heads * cfg.llm.head_dim),
        "self_attn.v_proj": (H, cfg.llm.num_kv_heads * cfg.llm.head_dim),
        "self_attn.o_proj": (cfg.llm.num_heads * cfg.llm.head_dim, H),
        "mlp.gate_proj": (H, cfg.llm.intermediate_size),
        "mlp.up_proj": (H, cfg.llm.intermediate_size),
        "mlp.down_proj": (cfg.llm.intermediate_size, H),
    }
    sd: dict = {}
    pre = "base_model.model.model.layers.{i}."
    for i in range(L):
        for name, (din, dout) in dims.items():
            a = 0.05 * rng.standard_normal((LORA_R, din))     # [r, in]
            b = 0.05 * rng.standard_normal((dout, LORA_R))    # [out, r]
            sd[pre.format(i=i) + name + ".lora_A.weight"] = a
            sd[pre.format(i=i) + name + ".lora_B.weight"] = b
    # modules_to_save: perturbed copies (so applying them is observable)
    proj = params["projector"]
    sd["base_model.model.model.mm_projector.0.weight"] = (
        np.asarray(proj["fc1"]["kernel"], np.float32).T + 0.01)
    sd["base_model.model.model.mm_projector.0.bias"] = (
        np.asarray(proj["fc1"]["bias"], np.float32))
    sd["base_model.model.model.mm_projector.2.weight"] = (
        np.asarray(proj["fc2"]["kernel"], np.float32).T)
    sd["base_model.model.model.mm_projector.2.bias"] = (
        np.asarray(proj["fc2"]["bias"], np.float32))
    for name in ("informative", "relevance", "uncertainty"):
        sd[f"base_model.model.{name}_head.weight"] = (
            np.asarray(params["heads"][name]["kernel"], np.float32).T)
    sd["base_model.model.lm_head.weight"] = (
        np.asarray(params["llm"]["lm_head"]["kernel"], np.float32).T)
    sd = {k: np.ascontiguousarray(v.astype(ml_dtypes.bfloat16))
          for k, v in sd.items()}
    save_file(sd, str(out / "adapter_model.safetensors"))
    (out / "adapter_config.json").write_text(json.dumps({
        "peft_type": "LORA", "r": LORA_R, "lora_alpha": LORA_ALPHA,
        "lora_dropout": 0.05,
        "target_modules": ["q_proj", "k_proj", "v_proj", "o_proj",
                           "gate_proj", "up_proj", "down_proj"],
        "modules_to_save": ["mm_projector", "informative_head",
                            "relevance_head", "uncertainty_head", "lm_head"],
        "task_type": "CAUSAL_LM",
    }, indent=1))


def generate(out_dir: str) -> tuple[str, str]:
    from aha_tpu.models import loader

    out = pathlib.Path(out_dir)
    ov, adapter = out / "ov", out / "adapter"
    ov.mkdir(parents=True, exist_ok=True)
    adapter.mkdir(parents=True, exist_ok=True)
    params, cfg = build_tiny()
    sd = loader.export_hf_state_dict(params, cfg)
    write_sharded_safetensors(sd, ov)
    write_config_json(cfg, ov)
    write_tokenizer(ov)
    write_adapter(params, cfg, adapter)
    print(f"wrote {ov} ({len(sd)} tensors, 2 shards) and {adapter}")
    return str(ov), str(adapter)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/aha_rehearsal")
    args = ap.parse_args()
    generate(args.out)


if __name__ == "__main__":
    main()

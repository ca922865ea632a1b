"""Checkpoint conversion tests with synthetic HF/peft state dicts."""

import numpy as np
import pytest

from aha_tpu.config import aha_tiny, qwen2_tiny
from aha_tpu.models import aha, loader, qwen2
from aha_tpu.train import lora as lora_lib


def test_convert_peft_lora_roundtrip():
    cfg = qwen2_tiny()
    rng = np.random.default_rng(0)
    r = 4
    sd = {}
    dims = lora_lib.proj_dims(cfg)
    prefix = "base_model.model.model."
    for name, hf in {
        "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }.items():
        din, dout = dims[name]
        for i in range(cfg.num_layers):
            sd[f"{prefix}layers.{i}.{hf}.lora_A.weight"] = rng.normal(
                size=(r, din)).astype(np.float32)
            sd[f"{prefix}layers.{i}.{hf}.lora_B.weight"] = rng.normal(
                size=(dout, r)).astype(np.float32)
    tree = loader.convert_peft_lora(sd, cfg)
    assert set(tree) == set(dims)
    L = cfg.num_layers
    assert tree["q_proj"]["a"].shape == (L, dims["q_proj"][0], r)
    assert tree["q_proj"]["b"].shape == (L, r, dims["q_proj"][1])
    # delta equivalence for layer 1: B @ A (torch layout) == (a @ b).T-ish
    want = sd[f"{prefix}layers.1.self_attn.q_proj.lora_B.weight"] @ \
        sd[f"{prefix}layers.1.self_attn.q_proj.lora_A.weight"]  # [out, in]
    got = np.asarray(tree["q_proj"]["a"][1] @ tree["q_proj"]["b"][1])  # [in, out]
    np.testing.assert_allclose(got, want.T, rtol=1e-5)


def test_convert_modules_to_save_and_apply():
    cfg = aha_tiny(vocab_size=64)
    params, cfg, _ = aha.build_model_and_tokenizer(cfg, seed=0)
    rng = np.random.default_rng(1)
    H, Hv, V = cfg.llm.hidden_size, cfg.vision.hidden_size, cfg.llm.vocab_size
    sd = {
        "base_model.model.model.mm_projector.0.weight": rng.normal(size=(H, Hv)).astype(np.float32),
        "base_model.model.model.mm_projector.0.bias": np.zeros(H, np.float32),
        "base_model.model.model.mm_projector.2.weight": rng.normal(size=(H, H)).astype(np.float32),
        "base_model.model.model.mm_projector.2.bias": np.zeros(H, np.float32),
        "base_model.model.informative_head.weight": rng.normal(size=(2, H)).astype(np.float32),
        "base_model.model.relevance_head.weight": rng.normal(size=(1, H)).astype(np.float32),
        "base_model.model.uncertainty_head.weight": rng.normal(size=(1, H)).astype(np.float32),
        "base_model.model.lm_head.weight": rng.normal(size=(V, H)).astype(np.float32),
    }
    overrides = loader.convert_peft_modules_to_save(sd)
    merged = loader.apply_overrides(params, overrides)
    np.testing.assert_allclose(
        np.asarray(merged["projector"]["fc1"]["kernel"]),
        sd["base_model.model.model.mm_projector.0.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(merged["heads"]["relevance"]["kernel"]),
        sd["base_model.model.relevance_head.weight"].T,
    )
    np.testing.assert_allclose(
        np.asarray(merged["llm"]["lm_head"]["kernel"]),
        sd["base_model.model.lm_head.weight"].T,
    )
    # untouched leaves survive the merge
    np.testing.assert_array_equal(
        np.asarray(merged["llm"]["embed"]["weight"]),
        np.asarray(params["llm"]["embed"]["weight"]),
    )
    assert "vision" in merged


@pytest.mark.slow
def test_offline_generate():
    from aha_tpu.config import InferConfig
    from aha_tpu.streaming.session import build_session

    cfg = aha_tiny(vocab_size=256)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    sess = build_session(params, cfg, tok, InferConfig(
        frame_fps=1.0, frame_resolution=cfg.frame_resolution,
        grounding_mode=True, kv_cache_policy="none", kv_window=1024,
        max_new_tokens=8))
    frames = np.random.default_rng(0).integers(
        0, 255, (4, cfg.frame_resolution, cfg.frame_resolution, 3), dtype=np.uint8)
    out = sess.offline_generate(frames, "what is shown?")
    assert isinstance(out, str)


def test_load_frame_folder(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from aha_tpu.data.media import load_frame_folder

    for i in range(5):
        img = np.full((40, 60, 3), i * 40, np.uint8)
        cv2.imwrite(str(tmp_path / f"frame_{i:03d}.jpg"), img)
    frames, fps, duration = load_frame_folder(str(tmp_path), output_size=32,
                                              output_fps=2.0, start=1, end=4)
    assert frames.shape == (3, 32, 32, 3)
    assert duration == pytest.approx(1.5)


def _hf_style_state_dict(params, cfg):
    """Build an HF-style torch state dict from our params (reverse layout)."""
    import torch

    sd = {}
    llm = params["llm"]
    L = cfg.llm.num_layers
    sd["model.embed_tokens.weight"] = torch.tensor(np.asarray(llm["embed"]["weight"]))
    sd["model.norm.weight"] = torch.tensor(np.asarray(llm["final_norm"]["scale"]))
    sd["lm_head.weight"] = torch.tensor(np.asarray(llm["lm_head"]["kernel"]).T)
    names = {
        "input_norm": "input_layernorm.weight",
        "post_norm": "post_attention_layernorm.weight",
    }
    for i in range(L):
        lyr = llm["layers"]
        sd[f"model.layers.{i}.input_layernorm.weight"] = torch.tensor(
            np.asarray(lyr["input_norm"]["scale"][i]))
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = torch.tensor(
            np.asarray(lyr["post_norm"]["scale"][i]))
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            sd[f"model.layers.{i}.self_attn.{proj}.weight"] = torch.tensor(
                np.asarray(lyr[proj]["kernel"][i]).T)
            if "bias" in lyr[proj]:
                sd[f"model.layers.{i}.self_attn.{proj}.bias"] = torch.tensor(
                    np.asarray(lyr[proj]["bias"][i]))
        for proj in ("gate_proj", "up_proj", "down_proj"):
            sd[f"model.layers.{i}.mlp.{proj}.weight"] = torch.tensor(
                np.asarray(lyr[proj]["kernel"][i]).T)
    vis = params["vision"]
    Lv = cfg.vision.num_layers
    sd["vision_model.embeddings.patch_embedding.weight"] = torch.tensor(
        np.asarray(vis["patch_embed"]["kernel"]).transpose(3, 2, 0, 1))
    sd["vision_model.embeddings.patch_embedding.bias"] = torch.tensor(
        np.asarray(vis["patch_embed"]["bias"]))
    sd["vision_model.embeddings.position_embedding.weight"] = torch.tensor(
        np.asarray(vis["pos_embed"]))
    sd["vision_model.post_layernorm.weight"] = torch.tensor(np.asarray(vis["post_ln"]["scale"]))
    sd["vision_model.post_layernorm.bias"] = torch.tensor(np.asarray(vis["post_ln"]["bias"]))
    vl = vis["layers"]
    vmap = {"ln1": "layer_norm1", "ln2": "layer_norm2",
            "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj", "out_proj": "self_attn.out_proj",
            "fc1": "mlp.fc1", "fc2": "mlp.fc2"}
    for i in range(Lv):
        for ours, theirs in vmap.items():
            if "kernel" in vl[ours]:
                sd[f"vision_model.encoder.layers.{i}.{theirs}.weight"] = torch.tensor(
                    np.asarray(vl[ours]["kernel"][i]).T)
            else:
                sd[f"vision_model.encoder.layers.{i}.{theirs}.weight"] = torch.tensor(
                    np.asarray(vl[ours]["scale"][i]))
            sd[f"vision_model.encoder.layers.{i}.{theirs}.bias"] = torch.tensor(
                np.asarray(vl[ours]["bias"][i]))
    proj = params["projector"]
    sd["model.mm_projector.0.weight"] = torch.tensor(np.asarray(proj["fc1"]["kernel"]).T)
    sd["model.mm_projector.0.bias"] = torch.tensor(np.asarray(proj["fc1"]["bias"]))
    sd["model.mm_projector.2.weight"] = torch.tensor(np.asarray(proj["fc2"]["kernel"]).T)
    sd["model.mm_projector.2.bias"] = torch.tensor(np.asarray(proj["fc2"]["bias"]))
    for name in ("informative", "relevance", "uncertainty"):
        sd[f"{name}_head.weight"] = torch.tensor(
            np.asarray(params["heads"][name]["kernel"]).T)

    return sd


def test_load_params_from_files(tmp_path, monkeypatch):
    """File-level checkpoint roundtrip: write a torch-style .bin state dict
    for the tiny composite model, load via load_params, check forward parity
    with the in-memory conversion."""
    import torch

    from aha_tpu.config import aha_tiny

    cfg = aha_tiny(vocab_size=64)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=3)
    sd = _hf_style_state_dict(params, cfg)

    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    torch.save(sd, ckpt_dir / "pytorch_model.bin")

    import jax.numpy as jnp

    loaded = loader.load_params(str(ckpt_dir), cfg, dtype=jnp.float32)
    # forward parity on a frame batch
    from aha_tpu.models.aha import visual_embed

    frames = np.random.default_rng(0).integers(
        0, 255, (2, cfg.frame_resolution, cfg.frame_resolution, 3), dtype=np.uint8)
    a = np.asarray(visual_embed(params, cfg, frames))
    b = np.asarray(visual_embed(loaded, cfg, frames))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_load_params_from_sharded_bf16_safetensors(tmp_path):
    """The real llava-onevision checkpoint ships as sharded bf16
    .safetensors; _read_state_dict must merge shards and preserve bf16
    (numpy framework reads bf16 via ml_dtypes)."""
    import torch
    from safetensors.torch import save_file

    from aha_tpu.config import aha_tiny

    cfg = aha_tiny(vocab_size=64)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=4)
    sd = {k: v.to(torch.bfloat16).contiguous()
          for k, v in _hf_style_state_dict(params, cfg).items()}

    ckpt_dir = tmp_path / "ckpt_st"
    ckpt_dir.mkdir()
    keys = sorted(sd)
    half = len(keys) // 2
    save_file({k: sd[k] for k in keys[:half]},
              str(ckpt_dir / "model-00001-of-00002.safetensors"))
    save_file({k: sd[k] for k in keys[half:]},
              str(ckpt_dir / "model-00002-of-00002.safetensors"))

    import jax.numpy as jnp

    loaded = loader.load_params(str(ckpt_dir), cfg, dtype=jnp.bfloat16)
    assert loaded["llm"]["embed"]["weight"].dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(loaded["llm"]["layers"]["q_proj"]["kernel"], np.float32),
        np.asarray(params["llm"]["layers"]["q_proj"]["kernel"], np.float32),
        rtol=1e-2, atol=1e-2)  # bf16 round-trip
    # converted projector/heads present and sane
    assert loaded["projector"]["fc1"]["kernel"].dtype == jnp.bfloat16
    assert set(loaded["heads"]) == {"informative", "relevance", "uncertainty"}


def test_load_adapter_dir_end_to_end(tmp_path):
    """`aha infer --lora_pretrained`: a peft adapter-only dir (safetensors +
    adapter_config.json) loads into (lora, overrides, scale); adapters
    change session scores and the multi-stream path applies the same lora
    (regression: --concurrent_streams used to drop adapters)."""
    import json

    import torch
    from safetensors.torch import save_file

    from aha_tpu.config import InferConfig, aha_tiny
    from aha_tpu.streaming.multi import MultiStreamScorer
    from aha_tpu.streaming.session import build_session
    from aha_tpu.train import lora as lora_lib

    cfg = aha_tiny(vocab_size=64)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=5)
    rng = np.random.default_rng(2)
    r = 4
    dims = lora_lib.proj_dims(cfg.llm)
    prefix = "base_model.model.model."
    hf_names = {
        "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }
    sd = {}
    for name, hf in hf_names.items():
        din, dout = dims[name]
        for i in range(cfg.llm.num_layers):
            sd[f"{prefix}layers.{i}.{hf}.lora_A.weight"] = torch.tensor(
                0.3 * rng.normal(size=(r, din)).astype(np.float32))
            sd[f"{prefix}layers.{i}.{hf}.lora_B.weight"] = torch.tensor(
                0.3 * rng.normal(size=(dout, r)).astype(np.float32))
    adir = tmp_path / "adapter"
    adir.mkdir()
    save_file(sd, str(adir / "adapter_model.safetensors"))
    (adir / "adapter_config.json").write_text(
        json.dumps({"r": r, "lora_alpha": 8}))

    lora, overrides, scale = loader.load_adapter(str(adir), cfg)
    assert scale == 2.0 and set(lora) == set(dims) and overrides == {}

    icfg = InferConfig(frame_fps=1.0, frame_resolution=cfg.frame_resolution,
                       grounding_mode=True, kv_cache_policy="sink",
                       kv_window=32, num_sink_tokens=4)
    video = rng.integers(0, 255, (3, cfg.frame_resolution,
                                  cfg.frame_resolution, 3), dtype=np.uint8)
    base = build_session(params, cfg, tok, icfg).score_video(video, query="q")
    with_lora = build_session(params, cfg, tok, icfg, lora=lora,
                              lora_scale=scale).score_video(video, query="q")
    assert any(abs(a["relevance_score"] - b["relevance_score"]) > 1e-6
               for a, b in zip(base, with_lora))

    scorer = MultiStreamScorer(params, cfg, tok, icfg, batch=2,
                               lora=lora, lora_scale=scale)
    batched = scorer.score_videos([video, video], ["q", "q"], fps=1.0)
    for row in batched:
        for a, b in zip(row, with_lora):
            for k in ("informative_score", "relevance_score",
                      "uncertainty_score"):
                np.testing.assert_allclose(a[k], b[k], rtol=3e-4, atol=3e-5)

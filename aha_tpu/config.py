"""Configuration dataclasses for aha_tpu.

Replaces the reference's three-tier flag system
(`/root/reference/models/arguments_live.py:5-83`,
`/root/reference/models/configuration_live.py:4-36`, dataset mixture JSON at
`/root/reference/configs/datasets/aha_config.json`) with plain dataclasses that
are trivially hashable/static for jit, serializable to JSON, and free of any
framework dependency.

Three groups:
  * architecture  — QwenConfig / SiglipConfig / AhaConfig (static model shape)
  * training      — TrainConfig (optimizer, LoRA, loss weights, data mixture)
  * inference     — InferConfig (stream decision thresholds, cache policy)
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any


# ---------------------------------------------------------------------------
# Architecture
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QwenConfig:
    """Qwen2-family decoder shape (ref: transformers Qwen2Config as used by
    `/root/reference/models/live_llava/video_head_live_llava_qwen.py:43-47`)."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    max_position_embeddings: int = 32768
    tie_word_embeddings: bool = False
    attention_bias: bool = True  # Qwen2 uses bias on q/k/v projections

    @property
    def q_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


@dataclass(frozen=True)
class SiglipConfig:
    """ViT vision tower shape. arch='siglip' (default:
    google/siglip-large-patch16-384, ref `/root/reference/models/arguments_live.py:13`,
    `/root/reference/models/vision_live.py:11-31`) or arch='clip' (the
    factory's CLIP-L option, `vision_live.py:34-64` — CLS token, pre-LN,
    quick-gelu, OpenAI normalization)."""

    image_size: int = 384
    patch_size: int = 16
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    layer_norm_eps: float = 1e-6
    arch: str = "siglip"  # "siglip" | "clip"
    # SigLIP's learned MAP (attention-pool) probe head — HF
    # `pooler_output`, consumed by the reference when frame_token_cls=True
    # (`vision_live.py:28`). Param subtree "head" exists iff this is set;
    # init_aha_params turns it on automatically for frame_token_cls.
    use_head: bool = False

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size


@dataclass(frozen=True)
class AhaConfig:
    """Full multimodal model: vision tower + projector + decoder + 3 heads.

    Frame/token fields mirror `/root/reference/models/configuration_live.py`
    and `/root/reference/models/arguments_live.py:19-27`.
    """

    llm: QwenConfig = field(default_factory=QwenConfig)
    vision: SiglipConfig = field(default_factory=SiglipConfig)

    frame_resolution: int = 384
    frame_token_pooled: tuple[int, int] = (7, 7)
    frame_token_cls: bool = False
    v_placeholder: str = "<image>"
    v_placeholder_id: int = -1  # filled in by tokenizer build
    eos_token_id: int = -1      # filled in by tokenizer build
    pooling_mode: str = "average"  # average | max | bilinear

    # ablation: detach hidden states before the three score heads so the
    # video losses never backprop into the trunk (ref
    # video_head_live_llava_qwen.py:44-47,180-184; default off there too)
    video_head_stop_grad: bool = False

    # dtype of the compute path ("bfloat16" on TPU; tests may use float32)
    dtype: str = "bfloat16"

    @property
    def frame_num_tokens(self) -> int:
        return self.frame_token_pooled[0] * self.frame_token_pooled[1] + (
            1 if self.frame_token_cls else 0
        )

    def replace(self, **kw) -> "AhaConfig":
        return dataclasses.replace(self, **kw)


# Presets -------------------------------------------------------------------


def qwen2_7b() -> QwenConfig:
    return QwenConfig()


def qwen2_tiny(vocab_size: int = 512) -> QwenConfig:
    """Tiny decoder for unit tests; same structural family as the 7B."""
    return QwenConfig(
        vocab_size=vocab_size,
        hidden_size=64,
        intermediate_size=128,
        num_layers=2,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        max_position_embeddings=2048,
    )


def siglip_large_384() -> SiglipConfig:
    return SiglipConfig()


def siglip_tiny() -> SiglipConfig:
    return SiglipConfig(
        image_size=32,
        patch_size=16,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
    )


def clip_large_336() -> SiglipConfig:
    """openai/clip-vit-large-patch14-336 (ref vision_live.py:60-62)."""
    return SiglipConfig(
        image_size=336,
        patch_size=14,
        layer_norm_eps=1e-5,
        arch="clip",
    )


def clip_tiny() -> SiglipConfig:
    return SiglipConfig(
        image_size=32,
        patch_size=16,
        hidden_size=32,
        intermediate_size=64,
        num_layers=2,
        num_heads=2,
        layer_norm_eps=1e-5,
        arch="clip",
    )


def aha_7b() -> AhaConfig:
    return AhaConfig()


def aha_tiny(vocab_size: int = 512) -> AhaConfig:
    return AhaConfig(
        llm=qwen2_tiny(vocab_size),
        vision=siglip_tiny(),
        frame_resolution=32,
        frame_token_pooled=(1, 1),
        dtype="float32",
    )


# ---------------------------------------------------------------------------
# Training / inference flags
# ---------------------------------------------------------------------------


@dataclass
class LossWeights:
    """Loss mixing weights (ref: video_head_live_llava_qwen.py:91-96)."""

    lm: float = 0.2
    video: float = 1.0
    info: float = 0.5
    relevance: float = 8.0
    uncertainty: float = 0.1
    tv: float = 0.05


@dataclass
class LoraConfig:
    """LoRA adapter shape (ref: arguments_live.py:15-18, modeling_live.py:153-164)."""

    r: int = 16
    alpha: int = 32
    dropout: float = 0.05
    # regex over flattened param paths, applied to decoder projections
    target_patterns: str = r"layers_\d+/(q_proj|k_proj|v_proj|o_proj|gate_proj|up_proj|down_proj)/kernel"
    # modules trained densely (not via adapters)
    finetune_modules: tuple[str, ...] = (
        "mm_projector",
        "lm_head",
        "informative_head",
        "relevance_head",
        "uncertainty_head",
    )


@dataclass
class TrainConfig:
    output_dir: str = "outputs/debug"
    dataset_config: str | None = None
    llm_pretrained: str | None = None       # path to converted weights, optional
    vision_pretrained: str | None = None
    lora_pretrained: str | None = None

    frame_fps: float = 2.0
    frame_resolution: int = 384
    max_num_frames: int = 100

    learning_rate: float = 2e-5
    warmup_ratio: float = 0.05
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    batch_size: int = 1
    grad_accum_steps: int = 2
    num_epochs: int = 1
    seed: int = 42
    save_steps: int = 25
    save_total_limit: int = 5
    logging_steps: int = 1
    resume_from_checkpoint: str | None = None

    lora: LoraConfig = field(default_factory=LoraConfig)
    loss_weights: LossWeights = field(default_factory=LossWeights)

    # mesh shape: data (fsdp) x model (tensor) x pipe (pipeline stage) axes
    mesh_data: int = -1   # -1: all remaining devices
    mesh_model: int = 1
    mesh_pipe: int = 1    # >1: GPipe over the decoder stack (parallel/pipeline.py)
    pipe_microbatches: int = 2  # GPipe microbatches per step (divides batch)

    # sequence-parallel ring attention (SURVEY §5 long-context): when on,
    # batches whose padded length reaches ring_min_seq run attention
    # sequence-sharded over the data axis (parallel/ring_attention.py)
    ring_attention: bool = False
    ring_min_seq: int = 2048

    # activation rematerialization policy for the LLM trunk
    # (models/qwen2.forward_hidden): "full" recomputes every layer forward
    # in backward (lowest HBM), "dots" saves matmul outputs and recomputes
    # only the cheap elementwise/norm ops (faster when activations fit),
    # "none" saves everything. Replaces the reference's
    # gradient_checkpointing=True HF flag (ref train.py TrainingArguments).
    # "half" checkpoints alternating layers (scan over 2-layer blocks,
    # remat the first of each pair): half the backward recompute of
    # "full" for ~L/2 layers of residual HBM — the middle rung where
    # "dots" does not compile (BASELINE.md round 3).
    remat_policy: str = "full"   # none | full | half | dots | dots_no_batch

    system_prompt: str = (
        "A multimodal AI assistant is helping users with some activities."
        " Below is their conversation, interleaved with the list of video frames"
        " received by the assistant."
    )


@dataclass
class InferConfig:
    """Streaming inference flags (ref: arguments_live.py:40-75,
    test/inference.py:38-100)."""

    system_prompt: str = (
        "A multimodal AI assistant is helping users with some activities."
        " Below is their conversation, interleaved with the list of video frames"
        " received by the assistant."
    )
    frame_fps: float = 2.0
    frame_resolution: int = 384
    max_num_frames: int | None = None

    grounding_mode: bool = False
    repetition_penalty: float | None = None

    # exactly one of the three stopping criteria may be set
    # (ref: test/inference.py:84-87)
    stream_end_prob_threshold: float | None = None
    threshold_z: float | None = None
    # suppress a new response within N frames of the previous one (the
    # reference accepts+forwards this flag but never evaluates it,
    # test/inference.py:75,621 — implemented per its description, like
    # threshold_z)
    response_min_interval_frames: int | None = None
    stream_end_score_sum_threshold: float | None = None

    first_n_frames_no_generate: int = 0
    running_list_length: int = 20
    # accepted for LiveTestArguments flag parity but BEHAVIORALLY INERT —
    # the reference assigns these in __init__ (test/inference.py:66-81) and
    # never reads them in any decision (consecutive_n_frames is reset at
    # :326 but the threshold is never compared; the wait flags appear in no
    # loop). Kept so reference run scripts parse; do not expect an effect.
    consecutive_n_frames_threshold: int = 1
    uncertainty_wait_threshold: float = 0.0
    max_wait_frames: int = 3
    remove_assistant_turns: bool = False
    score_heads: tuple[str, ...] = ("relevance_score", "informative_score")
    max_new_tokens: int = 200

    # KV cache policy: "sink" | "sliding" | "static" | "none"
    # (ref: test/inference.py:133-155)
    kv_cache_policy: str = "sink"
    kv_window: int = 2048
    num_sink_tokens: int = 32
    # "auto" (model dtype) | "int8": per-(slot, head) quantized KV — half
    # the cache HBM / attention DMA, ~0.5% attention-output error
    kv_cache_dtype: str = "auto"
    # speculative decoding: tokens verified per decoder pass (the carried
    # token + S-1 n-gram-lookup drafts). 1 = off (the plain sequential
    # loop). EXACT greedy parity either way — acceptance replays the
    # reference loop's argmax/eos/budget/penalty bookkeeping per position
    # (engine.generate_spec); env override AHA_SPEC_DECODE=S. Default 4:
    # measured on the v5e-1 7B int8 (scripts/perf/ab_spec_decode.py) the
    # verify pass is weight-DMA-bound like the 1-token pass, so rejected
    # drafts cost NOTHING (423.7 vs 420.6 tok/s at B=8) while acceptance
    # pays up to 3.6x (S=4) / 6.1x (S=8) — expected value >= 0 on any
    # workload, and answers that quote stream context accept often.
    spec_decode_tokens: int = 4
    # acceptance-adaptive speculation ceiling: when recent acceptance is
    # high (on-device EMA of committed-fraction > 0.8) the spec chunk
    # widens from spec_decode_tokens to this value, and narrows back when
    # acceptance drops. The measured reject-cost table (S=8 -2%, S=4 free
    # — BASELINE.md round 3) makes the gated switch >= fixed S=4 in
    # expectation: S=8 only runs while the drafter is being accepted, where
    # it is worth up to 6.1x. None/<=spec_decode_tokens = fixed width. Env
    # override AHA_SPEC_MAX.
    spec_decode_tokens_max: int | None = 8
    # "hf" (default): replicate the reference's transformers-4.49 mask
    # arithmetic, incl. its post-fill intra-chunk non-causality (see
    # CachePolicy.mask_mode); "strict": true causal order <= g
    kv_mask_mode: str = "hf"
    # batched retirement (continuous batching): the serving loop exits to
    # the host once this many rows have finished their frames (1 = exit
    # per retirement, the immediate-refill default). Higher values trade
    # idle slot time on finished rows for fewer host round-trips on
    # retirement-heavy ragged workloads; per-row outputs are identical
    # (scheduling only). A/B: scripts/perf/ab_batched_retirement.py.
    retire_defer: int = 1
    # fused frame scoring: frames verified per decoder weight stream on the
    # scan scoring paths (score_video / MultiStreamScorer — tvsum/hisum/
    # grounding, no generation). 1 = the plain per-frame scan. EXACT score
    # and cache parity either way (engine.append_frames_fused; tests/
    # test_fused_scoring.py) — frame inputs are known in advance, so unlike
    # speculative decode nothing can be rejected. Default 4: measured on
    # the v5e-1 7B int8 (scripts/perf/ab_fused_scoring.py) the per-frame
    # pass is weight-DMA-bound, so 4 frames ride one stream for 2.2x
    # single-stream scan throughput (83.7 -> 187.0 fps); env override
    # AHA_FUSED_SCORE=k.
    fused_score_frames: int = 4

    def validate(self) -> None:
        n_set = sum(
            x is not None
            for x in (
                self.stream_end_prob_threshold,
                self.threshold_z,
                self.stream_end_score_sum_threshold,
            )
        )
        if not self.grounding_mode and n_set != 1:
            raise ValueError(
                "exactly one of stream_end_prob_threshold / threshold_z / "
                f"stream_end_score_sum_threshold must be set, got {n_set}"
            )
        if self.threshold_z is not None and self.first_n_frames_no_generate is None:
            raise ValueError("first_n_frames_no_generate required with threshold_z")
        if self.threshold_z is not None and not (
                isinstance(self.running_list_length, int)
                and self.running_list_length >= 2):
            # one window semantics for every path: the stepwise host rule,
            # the solo chunked device loop and the multi-stream server all
            # keep a bounded running-list window of this length. None/0
            # (= unbounded history) would silently diverge between the
            # stepwise and on-device implementations.
            raise ValueError(
                "threshold_z requires running_list_length >= 2 (a bounded "
                f"z-score window), got {self.running_list_length!r}")
        if self.kv_cache_policy not in ("sink", "sliding", "static", "none"):
            raise ValueError(f"unknown kv_cache_policy {self.kv_cache_policy}")
        if self.kv_mask_mode not in ("hf", "strict"):
            raise ValueError(f"unknown kv_mask_mode {self.kv_mask_mode}")


# ---------------------------------------------------------------------------
# JSON round-trip helpers (for CLI --config files)
# ---------------------------------------------------------------------------


def _to_jsonable(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    return obj


def config_to_json(cfg: Any) -> str:
    return json.dumps(_to_jsonable(cfg), indent=2)


def config_from_dict(cls: type, data: dict) -> Any:
    """Recursively build a dataclass from a plain dict, tolerating extra keys."""
    field_map = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for name, f in field_map.items():
        if name not in data:
            continue
        value = data[name]
        ftype = f.type if isinstance(f.type, type) else None
        sub = _DATACLASS_FIELDS.get((cls, name))
        if sub is not None and isinstance(value, dict):
            kwargs[name] = config_from_dict(sub, value)
        elif isinstance(value, list):
            kwargs[name] = tuple(value)
        else:
            kwargs[name] = value
    return cls(**kwargs)


_DATACLASS_FIELDS: dict[tuple[type, str], type] = {
    (AhaConfig, "llm"): QwenConfig,
    (AhaConfig, "vision"): SiglipConfig,
    (TrainConfig, "lora"): LoraConfig,
    (TrainConfig, "loss_weights"): LossWeights,
}

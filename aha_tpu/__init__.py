"""aha_tpu — TPU-native streaming video highlight-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Aha!
reference ("Predicting What Matters Next: Online Highlight Detection
Without Looking Ahead", NeurIPS 2025; reference impl under
/root/reference). The compute path is jit/pjit over a device mesh with
static shapes throughout; the streaming runtime keeps all per-frame
state (ring-buffer KV cache, score accumulators, trigger logic) on
device so the hot loop has no host round-trips.

Layer map (mirrors SURVEY.md §1 of the reference, redesigned TPU-first):

  cli            — user-facing entry points (train / infer / evaluate / grid-search)
  streaming      — stateful stream sessions: push frame / push query -> scores + text
  models         — pure-functional Qwen2 decoder, SigLIP tower, projector, 3 score heads
  ops            — RoPE, ring-buffer KV cache, attention, pooling, smoothing, Pallas kernels
  data           — conversation datasets, label derivation, collator, video decode
  train          — multi-loss, LoRA, sharded train step, orbax checkpointing
  eval           — metrics (TVSum/HiSum/Charades/QVH/SODA), grid search, highlight reels
  parallel       — mesh construction and sharding rules (dp/fsdp/tp)
"""

__version__ = "0.1.0"

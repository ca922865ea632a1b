"""Optimizer: AdamW + warmup-cosine schedule + global-norm clipping, with a
trainable-parameter mask.

Reference trains with HF Trainer defaults: AdamW, lr 2e-5, cosine schedule,
warmup ratio 5%, max_grad_norm 1.0, grad-accum 2
(`/root/reference/scripts/train.sh:5-14`). The DeepSpeed ZeRO CPU-offload
machinery (`configs/deepspeed/zero2offload.json`) is replaced by sharding
the optimizer state with the same NamedSharding rules as the params —
ZeRO-1/2/3 fall out of `pjit` for free.
"""

from __future__ import annotations

import optax

from aha_tpu.config import TrainConfig


def cosine_schedule(cfg: TrainConfig, total_steps: int) -> optax.Schedule:
    warmup = max(1, int(cfg.warmup_ratio * total_steps))
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=warmup,
        decay_steps=total_steps,
        end_value=0.0,
    )


def build_optimizer(cfg: TrainConfig, total_steps: int, labels=None) -> optax.GradientTransformation:
    """labels: 'train'/'freeze' pytree (train.lora.trainable_labels); frozen
    leaves get zero updates and no optimizer state."""
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=cosine_schedule(cfg, total_steps),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
        ),
    )
    if labels is not None:
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx

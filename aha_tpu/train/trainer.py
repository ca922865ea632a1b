"""Training loop: jitted FSDP train step + orbax checkpointing.

Replaces the reference's HF Trainer + DeepSpeed stack (`/root/reference/
train.py:51-136`, `configs/deepspeed/*.json`) with a single pjit-sharded
train step: params, grads, and optimizer state are sharded by
`parallel.mesh.param_specs` (ZeRO-3 analog), the batch is sharded on the
`data` axis, and XLA inserts all collectives. The reference's
swallow-exceptions `TrainerWithLossErrorCatch` (train.py:19-33) is
unnecessary: data problems are handled in the host input pipeline; the
compiled step never diverges across ranks because there is only one program.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from aha_tpu.config import AhaConfig, TrainConfig
from aha_tpu.models import aha
from aha_tpu.parallel import mesh as mesh_lib
from aha_tpu.train import lora as lora_lib
from aha_tpu.train.losses import LossParts, aha_loss
from aha_tpu.train.optimizer import build_optimizer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    tree: dict          # {"model": AhaParams, "lora": lora tree | absent}
    opt_state: object
    step: jnp.ndarray


def init_train_state(
    cfg: AhaConfig,
    train_cfg: TrainConfig,
    params: dict,
    *,
    total_steps: int,
    seed: int = 0,
    use_lora: bool = True,
    lora_init: dict | None = None,
    abstract_opt: bool = False,
):
    """Returns (state, tx, labels, lora_scale).

    lora_init: start the adapters from an existing tree (fine-tune
    continuation from a published adapter — ref README continuation flow,
    modeling_live.py:149-151) instead of fresh init.

    abstract_opt: build the optimizer state as ShapeDtypeStructs instead
    of device buffers — for resume, where restore_checkpoint fills it from
    disk. Materializing ~4.5 GiB of AdamW moments only to overwrite them
    is what pushed the 7B resume over a 16 GB chip (round-4 on-chip run)."""
    lora_tree = None
    scale = 0.0
    if use_lora:
        lora_tree = lora_init if lora_init is not None else lora_lib.init_lora(
            cfg.llm, train_cfg.lora, jax.random.PRNGKey(seed + 7),
            dtype=jnp.float32,
        )
        scale = lora_lib.lora_scale(train_cfg.lora)
    tree = {"model": params}
    if lora_tree is not None:
        tree["lora"] = lora_tree
    labels = lora_lib.trainable_labels(params, lora_tree, train_cfg.lora.finetune_modules)
    tx = build_optimizer(train_cfg, total_steps, labels)
    if abstract_opt:
        opt_state = jax.eval_shape(tx.init, tree)
    else:
        opt_state = tx.init(tree)
    state = TrainState(tree=tree, opt_state=opt_state, step=jnp.int32(0))
    return state, tx, labels, scale


def make_train_step(cfg: AhaConfig, train_cfg: TrainConfig, tx, labels, lora_scale: float,
                    device_mesh=None):
    """Build the jitted train step. batch keys: input_ids, attention_mask,
    labels, informative_labels, relevance_labels, frames (all [B, ...]).

    The step differentiates ONLY the 'train'-labeled leaves: frozen leaves
    are closed over, never entering grad position. Besides skipping the
    (dead) backward accumulation buffers for the frozen 7B trunk, this is
    what lets the base tree hold int8/int4 quantized kernels — the QLoRA
    analog of the reference's NF4 + LoRA path
    (`/root/reference/models/modeling_live.py:114-133,148-168`): JAX
    refuses integer leaves in grad position, but gradients flowing
    *through* the dequant matmuls to the bf16 adapters are well-defined.

    device_mesh: required when train_cfg.ring_attention is on — sequences
    at/above ring_min_seq run sequence-parallel ring attention over the
    mesh's data axis."""
    weights = train_cfg.loss_weights
    if train_cfg.ring_attention and device_mesh is None:
        raise ValueError("ring_attention=True needs device_mesh")
    if train_cfg.mesh_pipe > 1 and device_mesh is None:
        raise ValueError("mesh_pipe>1 needs device_mesh")
    pipe = ((device_mesh, "pipe", train_cfg.pipe_microbatches)
            if train_cfg.mesh_pipe > 1 else None)
    label_leaves = jax.tree_util.tree_leaves(labels)
    base_rng = jax.random.PRNGKey(train_cfg.seed + 13)

    def forward_loss(tree, batch, step):
        params = tree["model"]
        lora_tree = tree.get("lora")
        T = batch["input_ids"].shape[1]
        ring = ((device_mesh, "data")
                if train_cfg.ring_attention and T >= train_cfg.ring_min_seq
                else None)
        outs = aha.forward_train(
            params, cfg,
            batch["input_ids"],
            batch.get("frames"),
            attn_mask=batch.get("attention_mask"),
            lora=lora_tree,
            lora_scale=lora_scale,
            remat=train_cfg.remat_policy,
            ring=ring,
            pipe=pipe,
            # peft-style adapter-input dropout (ref lora_dropout=0.05):
            # fresh masks every step, deterministic in (seed, step)
            lora_dropout=train_cfg.lora.dropout,
            dropout_rng=jax.random.fold_in(base_rng, step),
        )
        parts = aha_loss(
            outs.logits, outs.informative_logits, outs.relevance, outs.log_variance,
            input_ids=batch["input_ids"],
            labels=batch.get("labels"),
            informative_labels=batch.get("informative_labels"),
            relevance_labels=batch.get("relevance_labels"),
            weights=weights,
        )
        return parts.total, parts

    def train_step(state: TrainState, batch: dict):
        treedef = jax.tree_util.tree_structure(state.tree)
        flat = jax.tree_util.tree_leaves(state.tree)
        assert len(flat) == len(label_leaves), "labels/tree structure mismatch"
        train_leaves = [x for x, l in zip(flat, label_leaves) if l == "train"]
        frozen_leaves = [x for x, l in zip(flat, label_leaves) if l != "train"]

        def loss_fn(train_leaves, batch):
            it_t, it_f = iter(train_leaves), iter(frozen_leaves)
            tree = jax.tree_util.tree_unflatten(
                treedef,
                [next(it_t) if l == "train" else next(it_f) for l in label_leaves])
            return forward_loss(tree, batch, state.step)

        (_, parts), tgrads = jax.value_and_grad(loss_fn, has_aux=True)(
            train_leaves, batch)
        it_g = iter(tgrads)
        grads = jax.tree_util.tree_unflatten(
            treedef,
            [next(it_g) if l == "train" else jnp.zeros_like(x)
             for l, x in zip(label_leaves, flat)])
        updates, opt_state = tx.update(grads, state.opt_state, state.tree)
        tree = jax.tree_util.tree_map(lambda p, u: p + u.astype(p.dtype), state.tree, updates)
        return TrainState(tree=tree, opt_state=opt_state, step=state.step + 1), parts

    return jax.jit(train_step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Checkpointing (orbax) — ref relies on HF Trainer + DeepSpeed save/resume
# (`/root/reference/train.py:118-128`); here: sharded pytree checkpoints
# with step metadata + adapter-only export (the published artifact format).
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state: TrainState, *, keep: int = 5,
                    labels: dict | None = None) -> str:
    """With ``labels`` (the trainable-leaf partition from
    init_train_state): save only the TRAINED leaves + optimizer state +
    step — the frozen trunk is the base model, reproduced at resume time
    by the same build path that produced it (cmd_train reloads the base
    checkpoint and re-quantizes). Besides matching QLoRA resume
    semantics, this is what makes 7B resume fit one 16 GB chip: a
    full-tree restore must hold the live trunk AND its restored copy
    (2 x 8.2 GiB — measured OOM on the round-4 on-chip e2e run).
    ``labels=None`` keeps the legacy full-tree format (full fine-tunes)."""
    import orbax.checkpoint as ocp

    step = int(state.step)
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    if os.path.isdir(path):
        # this step is already on disk — the end-of-run save collides with
        # the in-loop save whenever total_steps % save_steps == 0 (orbax
        # refuses to overwrite; found by the 7B on-chip e2e run, round 4)
        return path
    if labels is None:
        payload = {"tree": state.tree, "opt_state": state.opt_state,
                   "step": step}
    else:
        trained = jax.tree_util.tree_map(
            lambda x, l: x if l == "train" else None, state.tree, labels)
        payload = {"trained": trained, "opt_state": state.opt_state,
                   "step": step}
    ocp.PyTreeCheckpointer().save(path, payload)
    _prune_checkpoints(ckpt_dir, keep)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, state: TrainState,
                       labels: dict | None = None) -> TrainState:
    """Restore into the structure of `state` (shapes/shardings preserved).

    With ``labels``: trained-only checkpoints (see save_checkpoint) —
    restored trained leaves are merged over the live tree, the frozen
    trunk is kept as-is (it is the base model the caller just rebuilt),
    so restore allocates ~1.5 GiB instead of a second full trunk. Falls
    back to the legacy full-tree format when the checkpoint predates the
    split."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.abspath(path)
    if labels is not None:
        # trained leaves restore into ABSTRACT targets: their live values
        # are discarded by the merge anyway, and a concrete template costs
        # a second copy of every buffer during restore (the 7B OOM)
        trained_t = jax.tree_util.tree_map(
            lambda x, l: (jax.ShapeDtypeStruct(x.shape, x.dtype)
                          if l == "train" else None),
            state.tree, labels)
        target = {"trained": trained_t, "opt_state": state.opt_state,
                  "step": int(state.step)}
        try:
            restored = ckptr.restore(path, item=target)
        except Exception:
            restored = None            # legacy full-tree checkpoint
        if restored is not None:
            it = iter(jax.tree_util.tree_leaves(restored["trained"]))
            merged = jax.tree_util.tree_map(
                lambda x, l: next(it) if l == "train" else x,
                state.tree, labels)
            return TrainState(tree=merged, opt_state=restored["opt_state"],
                              step=jnp.int32(restored["step"]))
    target = {"tree": state.tree, "opt_state": state.opt_state, "step": int(state.step)}
    restored = ckptr.restore(path, item=target)
    return TrainState(
        tree=restored["tree"], opt_state=restored["opt_state"],
        step=jnp.int32(restored["step"]),
    )


def _prune_checkpoints(ckpt_dir: str, keep: int) -> None:
    import shutil

    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    for d in steps[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def export_adapter(path: str, state: TrainState, labels: dict) -> None:
    """Save only the trained leaves (adapters + projector/heads/lm_head) —
    the analog of the reference's LoRA-adapter-only artifact
    (`modeling_live.py:149-151`)."""
    import orbax.checkpoint as ocp

    trained = jax.tree_util.tree_map(
        lambda x, l: x if l == "train" else None, state.tree, labels
    )
    ocp.PyTreeCheckpointer().save(os.path.abspath(path), trained)


# ---------------------------------------------------------------------------
# Host loop
# ---------------------------------------------------------------------------


class MetricLogger:
    """JSONL metrics log (+ optional wandb if importable & configured).
    Replaces the ref's wandb.log-inside-forward (video_head:286-308)."""

    def __init__(self, output_dir: str, use_wandb: bool = False, config: dict | None = None):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=os.environ.get("WANDB_PROJECT", "aha_tpu"), config=config)
            except Exception:
                self.wandb = None

    def log(self, step: int, parts: LossParts, extra: dict | None = None):
        rec = {
            "step": step,
            "time": time.time(),
            "train/total_loss": float(parts.total),
            "train/lm_loss": float(parts.lm),
            "train/video_loss": float(parts.video),
            "train/info_loss": float(parts.info),
            "train/ref_loss": float(parts.relevance),
            "train/tv_loss": float(parts.tv),
            "train/uncertainty_loss": float(parts.uncertainty),
            **(extra or {}),
        }
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log({k: v for k, v in rec.items() if k.startswith("train/")}, step=step)

    def close(self):
        self._f.close()


def train(
    cfg: AhaConfig,
    train_cfg: TrainConfig,
    params: dict,
    batches,                    # iterable of host batch dicts
    *,
    total_steps: int,
    device_mesh=None,
    use_lora: bool = True,
    lora_init: dict | None = None,
    log_every: int | None = None,
    use_wandb: bool = False,
    per_host_batches: bool = False,
) -> TrainState:
    """End-to-end loop: shard params on the mesh, resume if requested, run
    `total_steps` steps with periodic checkpoints.

    per_host_batches: multi-host jobs where `batches` yields only THIS
    host's rows (sharded loader); the global batch is assembled across
    processes — see parallel/mesh.shard_batch."""
    m = device_mesh or mesh_lib.make_mesh(
        train_cfg.mesh_data, train_cfg.mesh_model, train_cfg.mesh_pipe)
    state, tx, labels, scale = init_train_state(
        cfg, train_cfg, params, total_steps=total_steps, seed=train_cfg.seed,
        use_lora=use_lora, lora_init=lora_init,
        # resume fills the optimizer state from disk — don't materialize
        # 4.5 GiB of AdamW moments only to overwrite them (7B OOM fix)
        abstract_opt=bool(train_cfg.resume_from_checkpoint),
    )
    # drop the name: state.tree["model"] is the same object, and on resume
    # the restore merge replaces the trained leaves — a lingering `params`
    # binding would pin the pre-restore lm_head/projector copies (~1.25
    # GiB at 7B) through the first step's peak. Callers that want the
    # resume path to actually free them must not keep their own reference
    # either (scripts/perf/train_7b_e2e.py pops from a holder list).
    del params
    state = TrainState(
        tree=mesh_lib.apply_named_sharding(state.tree, m),
        opt_state=jax.tree_util.tree_map(
            lambda x: x, state.opt_state  # opt state inherits sharding via jit
        ),
        step=state.step,
    )
    if train_cfg.resume_from_checkpoint:
        state = restore_checkpoint(train_cfg.resume_from_checkpoint, state,
                                   labels)

    step_fn = make_train_step(cfg, train_cfg, tx, labels, scale, device_mesh=m)
    logger = MetricLogger(train_cfg.output_dir, use_wandb=use_wandb)
    ckpt_dir = os.path.join(train_cfg.output_dir, "checkpoints")

    # no mesh context needed: every input carries an explicit NamedSharding,
    # so jit infers the mesh from operand shardings
    for batch in batches:
        if int(state.step) >= total_steps:
            break
        batch = mesh_lib.shard_batch(batch, m, per_host=per_host_batches)
        state, parts = step_fn(state, batch)
        step = int(state.step)
        if step % (log_every or train_cfg.logging_steps) == 0:
            logger.log(step, jax.device_get(parts))
        if train_cfg.save_steps and step % train_cfg.save_steps == 0:
            save_checkpoint(ckpt_dir, state, keep=train_cfg.save_total_limit,
                            labels=labels)
    save_checkpoint(ckpt_dir, state, keep=train_cfg.save_total_limit,
                    labels=labels)
    export_adapter(os.path.join(train_cfg.output_dir, "adapter"), state, labels)
    logger.close()
    return state

"""Pipeline parallelism: GPipe microbatch schedule over a `pipe` mesh axis.

The reference has NO working pipeline parallelism (its
`configs/deepspeed/pipeline.json` is ZeRO-1 mislabeled — SURVEY §2.2);
this is a beyond-reference capability for scaling the decoder depth-wise
across chips when FSDP+TP alone can't hold a layer's working set.

TPU-native design: the decoder layers already live STACKED on a leading
[L, ...] axis (models/qwen2.py lax.scan) — pipeline sharding is just
`PartitionSpec('pipe')` on that axis, so each device owns L/S contiguous
layers with zero re-packing. Inside `shard_map` each stage runs its local
layer scan and hands activations to the next stage over ICI with
`lax.ppermute`; the GPipe schedule runs M + S - 1 ticks for M microbatches
over S stages (bubble fraction (S-1)/(M+S-1)). The backward pipeline falls
out of jax.grad: AD of the tick scan reverses the ppermute ring, so
cotangents flow stage S-1 -> 0 with the same schedule.

Composition: the batch stays sharded on `data` (each data-group runs its
own pipeline replica over its pipe-group); within a stage the local layer
params are materialized in full at the shard_map boundary (the FSDP
all-gather XLA would insert anyway). Everything outside the decoder stack
(embed, vision tower, lm_head, score heads, losses) stays under plain
GSPMD and is replicated over 'pipe'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level; fall back for older releases
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

import inspect

# replication checking was renamed check_rep -> check_vma across jax
# releases; the manual collectives here need it off either way
_sig = inspect.signature(shard_map).parameters
_SM_KW = ({"check_rep": False} if "check_rep" in _sig
          else {"check_vma": False} if "check_vma" in _sig else {})


def gpipe_scan_layers(
    mesh: Mesh,
    axis: str,
    layers,                 # pytree, leaves stacked [L, ...], sharded on dim0
    lora,                   # matching stacked pytree or None
    x: jnp.ndarray,         # [B, T, H] activations (batch-sharded on `data_axis`)
    extras,                 # pytree of [B, ...] batch-major arrays consumed by
                            # the layer body (attention mask, positions, rope
                            # cos/sin); leaves may be None
    layer_fn_mb,            # (x_mb, (lp, lora_l), extras_mb) -> x_mb
    n_micro: int,
    *,
    wrap=None,              # e.g. jax.checkpoint, applied per layer step
    data_axis: str = "data",
) -> jnp.ndarray:
    """Run the stacked layers as an S-stage GPipe pipeline; returns [B, T, H].

    layer_fn_mb receives ONE microbatch of activations plus the matching
    microbatch slice of `extras` — batch-dependent closures (attention
    mask, positions, rope tables) must come through `extras`, not closure,
    so they travel with the schedule.
    """
    S = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(layers)[0].shape[0]
    assert L % S == 0, f"{L} layers not divisible by {S} pipeline stages"

    def stage_spec(_):
        return P(axis)

    layer_specs = jax.tree_util.tree_map(stage_spec, layers)
    lora_specs = (None if lora is None
                  else jax.tree_util.tree_map(stage_spec, lora))
    batch_spec = P(data_axis)
    extras_specs = jax.tree_util.tree_map(lambda _: batch_spec, extras)

    def stage_body(layers_l, lora_l, x_full, extras_full):
        # x_full: this data-shard's [B_local, T, H]; layers_l: [L/S, ...]
        sid = jax.lax.axis_index(axis)
        B_local = x_full.shape[0]
        assert B_local % n_micro == 0, (
            f"local batch {B_local} not divisible by n_micro={n_micro}")
        mb = B_local // n_micro
        mbs = x_full.reshape(n_micro, mb, *x_full.shape[1:])
        mbs_extras = jax.tree_util.tree_map(
            lambda a: a.reshape(n_micro, mb, *a.shape[1:]), extras_full)

        did = jax.lax.axis_index(data_axis)

        def fold_rngs(lora_tree, salt):
            """Uniquify LoRA-dropout keys per (data shard, microbatch).

            forward_hidden pre-splits one key per (projection, layer); the
            non-pipe path draws its mask on the GLOBAL [B, T, H] shape so
            every row is independent. Here each microbatch (and each data
            shard under shard_map) draws on a local [mb, T, H] shape with
            the same key — without this fold every microbatch/shard would
            zero identical (row-position, token) entries."""
            if lora_tree is None:
                return None
            return {
                name: ({**ab, "rng": jax.vmap(
                            lambda k: jax.random.fold_in(k, salt))(ab["rng"])}
                       if isinstance(ab, dict) and "rng" in ab else ab)
                for name, ab in lora_tree.items()
            }

        def local_layers(x_mb, extras_mb, lora_s):
            def f(carry, scanned):
                return layer_fn_mb(carry, scanned, extras_mb), None

            if wrap is not None:
                f = wrap(f)
            y, _ = jax.lax.scan(f, x_mb, (layers_l, lora_s))
            return y

        def tick(carry, t):
            recv, outs = carry
            mb_id = jnp.clip(t - sid, 0, n_micro - 1)
            # stage 0 pulls the next microbatch; others consume the ring.
            # Bubble ticks (t - sid outside [0, M)) compute on a clamped
            # microbatch and never write — standard GPipe warmup/drain cost.
            x_in = jnp.where(sid == 0, mbs[mb_id], recv)
            extras_mb = jax.tree_util.tree_map(
                lambda a: a[mb_id], mbs_extras)
            y = local_layers(x_in, extras_mb,
                             fold_rngs(lora_l, did * n_micro + mb_id))
            valid = (t - sid >= 0) & (t - sid < n_micro)
            write = (sid == S - 1) & valid
            sel = (jnp.arange(n_micro, dtype=jnp.int32) == mb_id)
            sel = sel.reshape(n_micro, *([1] * y.ndim))
            outs = jnp.where(write & sel, y[None], outs)
            recv = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)])
            return (recv, outs), None

        recv0 = jnp.zeros_like(mbs[0])
        outs0 = jnp.zeros_like(mbs)
        (_, outs), _ = jax.lax.scan(
            tick, (recv0, outs0),
            jnp.arange(n_micro + S - 1, dtype=jnp.int32))
        # only stage S-1 holds real outputs; replicate them to every stage
        outs = jax.lax.psum(
            jnp.where(sid == S - 1, outs, jnp.zeros_like(outs)), axis)
        return outs.reshape(x_full.shape)

    fn = shard_map(
        stage_body, mesh=mesh,
        in_specs=(layer_specs, lora_specs, batch_spec, extras_specs),
        out_specs=batch_spec,
        **_SM_KW,
    )
    return fn(layers, lora, x, extras)

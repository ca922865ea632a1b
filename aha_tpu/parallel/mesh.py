"""Device mesh + sharding rules.

Replaces the reference's NCCL/DeepSpeed distributed substrate
(`/root/reference/utils/dist_utils.py:46-78`,
`/root/reference/configs/deepspeed/*.json`) with the XLA-native design:
one `Mesh(devices, ('data', 'model'))`; DP/ZeRO-3 = FSDP-style sharding of
params and optimizer state along `data`; TP = Megatron-style head/ffn
sharding along `model`. Collectives are inserted by XLA from the
NamedSharding annotations — no explicit communication calls anywhere.

Rules (scaling-book recipe):
  * attention q/o kernels — shard head dim over `model`, hidden over `data`
  * mlp gate/up/down      — shard intermediate over `model`, hidden over `data`
  * k/v kernels           — shard kv-head dim over `model` when divisible
                            (GQA: only 4 kv heads — replicate otherwise)
  * embed / lm_head       — vocab over `model`, hidden over `data`
  * norms / biases / small heads — replicated
  * activations/batch     — batch over `data`

Every rule is divisibility-guarded: a dim is only sharded when the axis
size divides it, so the same code runs on 1 chip, a v5e-8, or a multi-slice
mesh without shape surgery.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, pipe: int = 1, devices=None) -> Mesh:
    """('data', 'model') mesh, plus a trailing 'pipe' axis when pipe > 1
    (GPipe stages — parallel/pipeline.py)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * pipe) == 0, \
            f"{n} devices not divisible by model={model}*pipe={pipe}"
        data = n // (model * pipe)
    assert data * model * pipe == n, f"mesh {data}x{model}x{pipe} != {n} devices"
    if pipe > 1:
        arr = np.asarray(devices).reshape(data, model, pipe)
        return Mesh(arr, ("data", "model", "pipe"))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def _guard(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Truncate/pad the spec to the array rank and drop axis assignments
    whose mesh size does not divide the dim."""
    entries = (tuple(spec) + (None,) * len(shape))[: len(shape)]
    out = []
    for dim, axis in zip(shape, entries):
        if axis is None:
            out.append(None)
        else:
            size = mesh.shape[axis]
            out.append(axis if dim % size == 0 else None)
    return P(*out)


# path-suffix -> desired spec for stacked decoder/vision kernels.
# Layer-stacked kernels are [L, in, out]; L is never sharded (scan axis).
_KERNEL_RULES: list[tuple[tuple[str, ...], P]] = [
    (("q_proj", "kernel"), P(None, "data", "model")),
    (("k_proj", "kernel"), P(None, "data", "model")),
    (("v_proj", "kernel"), P(None, "data", "model")),
    (("o_proj", "kernel"), P(None, "model", "data")),
    (("out_proj", "kernel"), P(None, "model", "data")),
    (("gate_proj", "kernel"), P(None, "data", "model")),
    (("up_proj", "kernel"), P(None, "data", "model")),
    (("down_proj", "kernel"), P(None, "model", "data")),
    (("fc1", "kernel"), P(None, "data", "model")),
    (("fc2", "kernel"), P(None, "model", "data")),
    (("embed", "weight"), P("model", "data")),
    (("lm_head", "kernel"), P("data", "model")),
    # non-stacked projector kernels [in, out]
    (("projector", "fc1", "kernel"), P("data", "model")),
    (("projector", "fc2", "kernel"), P("model", "data")),
    (("pos_embed",), P(None, "data")),
    (("patch_embed", "kernel"), P()),
]


def _path_keys(path_tuple) -> tuple[str, ...]:
    return tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in path_tuple)


def spec_for(path_keys: tuple[str, ...], shape: tuple[int, ...]) -> P:
    # quantized kernels (ops/quant.py) nest {"qvalue","scale"} /
    # {"q4value","scale4"} under the kernel key: inherit the kernel's rule.
    # qvalue shares the kernel's shape; the scales keep the contracted dim
    # at size 1 (int8) or K/G (int4), so the divisibility guard in `_guard`
    # keeps only the axis assignments that still apply.
    if path_keys and path_keys[-1] in ("qvalue", "scale", "q4value", "scale4"):
        return spec_for(path_keys[:-1], shape)
    # longest suffix wins (projector/fc1/kernel beats fc1/kernel)
    for suffix, spec in sorted(_KERNEL_RULES, key=lambda r: -len(r[0])):
        if path_keys[-len(suffix):] == suffix:
            return spec
    # lora adapter pairs: a [L, in, r] / b [L, r, out] — shard the big dim
    if len(path_keys) >= 2 and path_keys[-1] in ("a", "b") and len(shape) == 3:
        return P(None, "data", None) if path_keys[-1] == "a" else P(None, None, "data")
    return P()  # norms, biases, heads: replicated


def _pipe_stacked(path_keys: tuple[str, ...]) -> bool:
    """Leaves whose leading [L, ...] axis shards over 'pipe': the decoder
    layer stack and the (stacked) LoRA adapters. The vision tower stays
    outside the pipeline (replicated over 'pipe')."""
    if "vision" in path_keys:
        return False
    if "layers" in path_keys:
        return True
    return "lora" in path_keys and path_keys[-1] in ("a", "b")


def param_specs(tree: dict, mesh: Mesh) -> dict:
    """PartitionSpec pytree for a param/opt-state tree (divisibility-guarded).

    With a 'pipe' mesh axis, decoder-stack leaves additionally shard their
    leading layer axis over it (pipeline stages own contiguous layers)."""
    has_pipe = "pipe" in mesh.axis_names and mesh.shape["pipe"] > 1

    def one(path, leaf):
        keys = _path_keys(path)
        shape = np.shape(leaf)
        spec = spec_for(keys, shape)
        if has_pipe and shape and _pipe_stacked(keys):
            entries = list((tuple(spec) + (None,) * len(shape))[: len(shape)])
            entries[0] = "pipe"
            spec = P(*entries)
        return _guard(spec, shape, mesh)

    return jax.tree_util.tree_map_with_path(one, tree)


def _put(x, sharding: NamedSharding):
    """Host array -> (possibly multi-process) sharded device array.

    Single-process: plain device_put. Multi-process (jax.distributed):
    device_put cannot target non-addressable shards, so build the global
    array from a callback — every host holds the same full copy (true for
    PARAMS and replicated-loader batches; per-host-sharded batches go
    through the `per_host` path in shard_batch instead) and contributes
    its addressable shards."""
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.device_put(x, sharding)


def data_axis_spans_processes(mesh: Mesh) -> bool:
    """True when every process owns an equal contiguous block of `data`-axis
    rows (each row's devices live on ONE process) — the layout required for
    per-host batch assembly. Holds for the standard process-major device
    enumeration whenever model*pipe divides the local device count."""
    if jax.process_count() == 1:
        return True
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    data = axes.get("data", 1)
    if data % jax.process_count() != 0:
        return False
    rows = mesh.devices.reshape(data, -1)
    row_proc = [{d.process_index for d in row} for row in rows]
    if any(len(s) != 1 for s in row_proc):
        return False
    owners = [next(iter(s)) for s in row_proc]
    per = data // jax.process_count()
    if not all(owners[i] == owners[i - 1] for i in range(1, len(owners))
               if (i % per) != 0):
        return False
    # each process must own exactly one block (e.g. a mesh whose data axis
    # lives entirely on host 0 while 'model' spans hosts fails here)
    return len(set(owners[::per])) == jax.process_count()


def apply_named_sharding(tree: dict, mesh: Mesh, specs: dict | None = None):
    """device_put the tree with NamedShardings (host -> sharded device arrays)."""
    specs = specs if specs is not None else param_specs(tree, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), tree, specs
    )


def cache_specs(cache, mesh: Mesh):
    """PartitionSpecs for a streaming KVCache: kv heads over `model`
    (TP inference — each shard attends with its own heads), batch over
    `data` (multi-stream serving), metadata along batch. Divisibility-
    guarded like everything else (GQA has only 4 kv heads on the 7B).
    int8 KV mode adds per-(slot, head) scales sharded like k/v."""
    from aha_tpu.ops.kv_cache import KVCache

    def g(spec, arr):
        return _guard(spec, np.shape(arr), mesh)

    def g_opt(spec, arr):
        return None if arr is None else g(spec, arr)

    return KVCache(
        k=g(P(None, "data", None, "model", None), cache.k),
        v=g(P(None, "data", None, "model", None), cache.v),
        key_pos=g(P("data", None), cache.key_pos),
        order=g(P("data", None), cache.order),
        seen=g(P("data"), cache.seen),
        length=g(P("data"), cache.length),
        k_scale=g_opt(P(None, "data", None, "model"), cache.k_scale),
        v_scale=g_opt(P(None, "data", None, "model"), cache.v_scale),
    )


def shard_cache(cache, mesh: Mesh):
    specs = cache_specs(cache, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: _put(x, NamedSharding(mesh, s)), cache, specs
    )


def batch_spec() -> P:
    return P("data")


def shard_batch(batch: dict, mesh: Mesh, *, per_host: bool = False) -> dict:
    """Shard a host batch dict along the data axis (leading dim).

    per_host=False (default / single-process): `batch` is the full global
    batch; multi-process callers must then feed IDENTICAL batches on every
    host (replicated-loader convention).

    per_host=True (multi-process): `batch` holds only THIS host's rows —
    the data/pipeline.batch_iterator shard-across-hosts convention — and
    the global array is assembled from each process's local rows
    (jax.make_array_from_process_local_data). Requires the `data` mesh
    axis to span processes in contiguous per-process blocks
    (data_axis_spans_processes); cmd_train checks this before enabling
    sharded loading."""
    n_proc = jax.process_count()
    if per_host and n_proc > 1:
        assert data_axis_spans_processes(mesh), (
            "per-host batches need the data axis split in contiguous "
            "per-process blocks; use replicated loading on this mesh")

        def put(x):
            x = np.asarray(x)
            gshape = (x.shape[0] * n_proc, *x.shape[1:])
            spec = _guard(P("data"), gshape, mesh)
            s = NamedSharding(mesh, spec)
            if not spec or spec[0] != "data":
                # batch dim not shardable on this mesh -> rows cannot be
                # host-local; caller's span check should prevent this
                raise ValueError(
                    f"global batch {gshape[0]} not divisible by data axis "
                    f"{mesh.shape['data']} — cannot assemble per-host rows")
            return jax.make_array_from_process_local_data(s, x, gshape)

        return {k: put(v) for k, v in batch.items() if v is not None}

    def put(x):
        x = np.asarray(x)
        spec = _guard(P("data"), x.shape, mesh)
        return _put(x, NamedSharding(mesh, spec))

    return {k: put(v) for k, v in batch.items() if v is not None}

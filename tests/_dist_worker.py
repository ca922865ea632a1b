"""Worker for tests/test_dist_multiprocess.py — NOT collected by pytest.

Runs one process of a 2-process jax.distributed CPU job: initializes the
runtime through utils.dist.init_distributed (the production multi-host
entry path, ref utils/dist_utils.py:46-78), builds the deterministic tiny
model + batch, runs ONE sharded FSDP train step over the global 2-device
mesh, and prints the loss as `LOSS <value>`.

Usage: python _dist_worker.py <process_id> <coordinator_port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon otherwise

pid, port = int(sys.argv[1]), sys.argv[2]

from aha_tpu.utils import dist as dist_utils

info = dist_utils.init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 2, info

import numpy as np
import jax.numpy as jnp

from aha_tpu.config import TrainConfig, aha_tiny
from aha_tpu.models import aha
from aha_tpu.parallel import mesh as mesh_lib
from aha_tpu.train.trainer import init_train_state, make_train_step

import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_train import make_batch  # the same deterministic batch builder

cfg = aha_tiny(vocab_size=128)
params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=1)
train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1, warmup_ratio=0.0)
batch_np = make_batch(cfg, tok, np.random.default_rng(1), B=4, n_frames=2)

m = mesh_lib.make_mesh(2, 1)           # data=2 over the two global devices
state, tx, labels, scale = init_train_state(cfg, train_cfg, params,
                                            total_steps=10)
tree = mesh_lib.apply_named_sharding(state.tree, m)
state = type(state)(tree=tree, opt_state=tx.init(tree), step=state.step)
step = make_train_step(cfg, train_cfg, tx, labels, scale)
batch = mesh_lib.shard_batch(batch_np, m)
state, parts = step(state, batch)
total = float(jax.device_get(
    jax.jit(lambda x: x, out_shardings=jax.sharding.NamedSharding(
        m, jax.sharding.PartitionSpec()))(parts.total)))
# NOTE: init_distributed gates builtins.print to the master process
# (setup_for_distributed) — write to stdout directly so BOTH workers report
sys.stdout.write(f"LOSS {total:.8f}\n")
sys.stdout.flush()

# --- per-host batch assembly (sharded-loader convention) -------------------
# each process supplies only ITS contiguous block of rows; the global batch
# shard_batch(per_host=True) assembles must equal the full replicated batch,
# so the step loss from a fresh identical state must match LOSS exactly.
assert mesh_lib.data_axis_spans_processes(m)


def _half(v):
    # leading dims differ per key (frames are [B*n_frames, ...]): each
    # process takes its contiguous half of whatever the leading dim is
    v = np.asarray(v)
    h = v.shape[0] // 2
    return v[pid * h:(pid + 1) * h]


local = {k: _half(v) for k, v in batch_np.items() if v is not None}
state2, tx2, labels2, scale2 = init_train_state(cfg, train_cfg, params,
                                                total_steps=10)
tree2 = mesh_lib.apply_named_sharding(state2.tree, m)
state2 = type(state2)(tree=tree2, opt_state=tx2.init(tree2), step=state2.step)
step2 = make_train_step(cfg, train_cfg, tx2, labels2, scale2)
batch2 = mesh_lib.shard_batch(local, m, per_host=True)
# global leading dims = 2x the local contribution
assert all(b.shape[0] == 2 * local[k].shape[0] for k, b in batch2.items())
state2, parts2 = step2(state2, batch2)
total2 = float(jax.device_get(
    jax.jit(lambda x: x, out_shardings=jax.sharding.NamedSharding(
        m, jax.sharding.PartitionSpec()))(parts2.total)))
sys.stdout.write(f"LOSS2 {total2:.8f}\n")
sys.stdout.flush()

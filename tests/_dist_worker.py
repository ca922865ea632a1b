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

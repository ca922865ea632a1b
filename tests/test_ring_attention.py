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

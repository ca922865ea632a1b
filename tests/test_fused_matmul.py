"""Parity: fused Pallas quantized matmuls vs the jnp dequant references
(ops/quant.py). Interpret mode on CPU; real-chip A/B in scripts/perf/."""

import numpy as np
import pytest

import jax.numpy as jnp

from aha_tpu.ops.pallas.fused_matmul import (
    int4_matmul,
    int4_matmul_t,
    int4_qlinear,
    int8_matmul,
)
from aha_tpu.ops.quant import (
    dequantize,
    dequantize_int4,
    qlinear_w8a8,
    quantize_array,
    quantize_array_int4,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    K, N = 512, 256
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.float32)
    x = jnp.asarray(rng.standard_normal((3, 7, K)), jnp.float32)  # ragged M=21
    return x, w


def test_int8_matmul_matches_dequant(data):
    x, w = data
    q8 = quantize_array(w, 0)
    ref = jnp.einsum("...k,kn->...n", x, dequantize(q8, jnp.float32))
    out = int8_matmul(x, q8["qvalue"], q8["scale"], block_n=128, block_k=256,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_int8_matmul_a8_matches_w8a8(data):
    x, w = data
    q8 = quantize_array(w, 0)
    ref = qlinear_w8a8(x, q8)
    out = int8_matmul(x, q8["qvalue"], q8["scale"], a8=True,
                      block_n=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("group", [128, 256])
def test_int4_matmul_matches_dequant(data, group):
    x, w = data
    q4 = quantize_array_int4(w, 0, group=group)
    ref = jnp.einsum("...k,kn->...n", x, dequantize_int4(q4, jnp.float32))
    out = int4_matmul(x, q4["q4value"], q4["scale4"], block_n=128, block_k=256,
                      interpret=True)
    # scale4 is stored bf16 in both paths; differences are accumulation order
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


def test_int4_matmul_a8_close_to_dequant(data):
    x, w = data
    q4 = quantize_array_int4(w, 0)
    ref = jnp.einsum("...k,kn->...n", x, dequantize_int4(q4, jnp.float32))
    out = int4_matmul(x, q4["q4value"], q4["scale4"], a8=True,
                      block_n=128, block_k=256, interpret=True)
    # activation quantization adds ~1% relative error
    denom = np.abs(np.asarray(ref)).mean() + 1e-6
    rel = np.abs(np.asarray(out) - np.asarray(ref)).mean() / denom
    assert rel < 0.03, rel


def test_single_token_row(data):
    _, w = data
    q4 = quantize_array_int4(w, 0)
    x1 = jnp.asarray(np.random.default_rng(1).standard_normal((1, w.shape[0])), jnp.float32)
    ref = jnp.einsum("mk,kn->mn", x1, dequantize_int4(q4, jnp.float32))
    out = int4_matmul(x1, q4["q4value"], q4["scale4"], block_n=128, block_k=256,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("group", [128, 256])
def test_int4_matmul_t_matches_dequant(data, group):
    """Transposed kernel (the QLoRA backward): g @ W^T vs the dequant
    reference, including the group-scale-on-the-output-side arithmetic."""
    x, w = data
    K, N = w.shape
    q4 = quantize_array_int4(w, 0, group=group)
    g = jnp.asarray(np.random.default_rng(3).standard_normal((3, 7, N)),
                    jnp.float32)
    ref = jnp.einsum("...n,kn->...k", g, dequantize_int4(q4, jnp.float32))
    out = int4_matmul_t(g, q4["q4value"], q4["scale4"], block_n=128,
                        block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_int4_qlinear_grad_matches_dequant(data):
    """jax.grad through the custom-VJP int4 linear == grad through the
    dequantize-then-einsum path (what makes the int4 trunk trainable)."""
    import jax

    x, w = data
    q4 = quantize_array_int4(w, 0)
    wd = dequantize_int4(q4, jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(4).standard_normal(
        (*x.shape[:-1], w.shape[1])), jnp.float32)

    def loss_fused(x_):
        return jnp.sum((int4_qlinear(x_, q4["q4value"], q4["scale4"], None)
                        - tgt) ** 2)

    def loss_ref(x_):
        return jnp.sum((jnp.einsum("...k,kn->...n", x_, wd) - tgt) ** 2)

    gf = jax.grad(loss_fused)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=2e-4, atol=2e-4)


def test_int4_qlinear_grad_stacked_layer(data):
    """The scan pattern: stacked [L, K/2, N] weights with a traced layer
    index — grads must route through the selected layer's weights."""
    import jax

    x, w = data
    rng = np.random.default_rng(5)
    K, N = w.shape
    L = 2
    ws = jnp.asarray(rng.standard_normal((L, K, N)) * 0.02, jnp.float32)
    q4 = quantize_array_int4(ws, 1)

    for i in range(L):
        wd = dequantize_int4(
            {"q4value": q4["q4value"][i], "scale4": q4["scale4"][i]},
            jnp.float32)
        gf = jax.grad(lambda x_: jnp.sum(int4_qlinear(
            x_, q4["q4value"], q4["scale4"], jnp.int32(i)) ** 2))(x)
        gr = jax.grad(lambda x_: jnp.sum(
            jnp.einsum("...k,kn->...n", x_, wd) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4)


def test_stacked_layer_indexing(data):
    """The scan-friendly path: stacked [L, K, N] weights indexed by a traced
    layer scalar via scalar prefetch — each layer must match its own
    dequant matmul."""
    import jax

    x, w = data
    rng = np.random.default_rng(2)
    K, N = w.shape
    L = 3
    ws = jnp.asarray(rng.standard_normal((L, K, N)) * 0.02, jnp.float32)
    q8 = quantize_array(ws, 1)          # [L, K, N] w/ scale [L, 1, N]
    q4 = quantize_array_int4(ws, 1)     # packed [L, K/2, N]

    for i in range(L):
        ref8 = jnp.einsum("...k,kn->...n", x, dequantize(
            {"qvalue": q8["qvalue"][i], "scale": q8["scale"][i]}, jnp.float32))
        out8 = int8_matmul(x, q8["qvalue"], q8["scale"], jnp.int32(i),
                           block_n=128, block_k=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out8), np.asarray(ref8),
                                   rtol=2e-5, atol=2e-5)
        ref4 = jnp.einsum("...k,kn->...n", x, dequantize_int4(
            {"q4value": q4["q4value"][i], "scale4": q4["scale4"][i]}, jnp.float32))
        out4 = int4_matmul(x, q4["q4value"], q4["scale4"], jnp.int32(i),
                           block_n=128, block_k=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4),
                                   rtol=3e-5, atol=3e-5)

    # and under a lax.scan over the layer index (the decode_chunk pattern)
    def body(carry, i):
        y = int8_matmul(x, q8["qvalue"], q8["scale"], i,
                        block_n=128, block_k=256, interpret=True)
        return carry, y

    _, ys = jax.lax.scan(body, None, jnp.arange(L))
    for i in range(L):
        ref = jnp.einsum("...k,kn->...n", x, dequantize(
            {"qvalue": q8["qvalue"][i], "scale": q8["scale"][i]}, jnp.float32))
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

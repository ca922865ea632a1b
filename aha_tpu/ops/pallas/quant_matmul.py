"""Fused int8-weight matmul Pallas kernel.

The jnp int8 path (`ops/quant.py`) dequantizes the whole weight to bf16
before the matmul; on TPU that can triple HBM traffic per step
(read int8 + write bf16 + read bf16). This kernel streams int8 tiles from
HBM, converts to bf16 in VMEM (free — on-chip), runs the MXU matmul in
f32, and applies the per-output-channel scale to the accumulator:

    out[m, n] = (sum_k x[m, k] * q[k, n]) * scale[n]

HBM traffic per matmul = int8 weight bytes + activations: the bandwidth
floor for weight-streaming decode, ~2x the dequant-materialize path.

Grid: (N tiles, K tiles) with an f32 VMEM accumulator — K is innermost so
each output tile accumulates across K before moving on.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, n_k: int, out_dtype):
    k_idx = pl.program_id(2)  # grid = (M tiles, N tiles, K tiles); K innermost

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[:].astype(jnp.bfloat16)  # int8 -> bf16 in VMEM (on-chip)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[0][None, :]).astype(out_dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def _quant_matmul_2d(
    x: jnp.ndarray,        # [M, K] bf16/f32
    qvalue: jnp.ndarray,   # [K, N] int8
    scale: jnp.ndarray,    # [N] f32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    M, K = x.shape
    K2, N = qvalue.shape
    assert K == K2, (K, K2)
    out_dtype = x.dtype

    xp = _pad_to(_pad_to(x, 0, 16), 1, block_k)
    qp = _pad_to(_pad_to(qvalue, 0, block_k), 1, block_n)
    sp = _pad_to(scale.reshape(1, -1).astype(jnp.float32), 1, block_n)
    Mp, Kp = xp.shape
    Np = qp.shape[1]
    bm = min(block_m, Mp)
    n_k = Kp // block_k

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k, out_dtype=out_dtype),
        grid=(Mp // bm, Np // block_n, n_k),
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, block_n), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * Kp * Np,
            bytes_accessed=Mp * Kp * 2 + Kp * Np + Mp * Np * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, qp, sp)
    return out[:M, :N]


def quant_matmul(x: jnp.ndarray, qvalue: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x [..., K] @ int8 qvalue [K, N] * scale -> [..., N].

    scale accepts [N], [1, N], or any shape reshapeable to [N]. Falls back
    to interpret mode off-TPU (tests / CPU meshes).
    """
    interpret = jax.default_backend() not in ("tpu", "axon")
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = qvalue.shape[-1]
    out = _quant_matmul_2d(
        x.reshape(-1, K), qvalue, scale.reshape(-1), interpret=interpret
    )
    return out.reshape(*lead, N)

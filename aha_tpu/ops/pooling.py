"""Spatial token pooling for vision features.

The reference pools the ViT patch grid two ways:
  * adaptive average pooling to a fixed (ph, pw) grid
    (`/root/reference/models/vision_live.py:17-24`), and
  * stride-s avg/max pool2d after the projector
    (`/root/reference/models/live_llava/video_head_live_llava_qwen.py:117-136`).

On TPU we express adaptive average pooling as two small dense matmuls
(rows then cols) with precomputed static weight matrices — MXU-friendly and
trivially fusable, instead of gather/segment ops.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """M [out, in] such that M @ x == adaptive_avg_pool1d(x, out_size)
    (torch convention: bin i covers [floor(i*in/out), ceil((i+1)*in/out)))."""
    M = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = math.ceil((i + 1) * in_size / out_size)
        M[i, start:end] = 1.0 / (end - start)
    return M


def adaptive_avg_pool_grid(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """x: [N, H, W, C] -> [N, ph, pw, C] by separable adaptive averaging."""
    _, H, W, _ = x.shape
    mh = jnp.asarray(_adaptive_avg_matrix(H, out_hw[0]))
    mw = jnp.asarray(_adaptive_avg_matrix(W, out_hw[1]))
    x = jnp.einsum("ph,nhwc->npwc", mh, x.astype(jnp.float32))
    x = jnp.einsum("qw,npwc->npqc", mw, x)
    return x


def pool_patch_tokens(
    tokens: jnp.ndarray, grid: int, out_hw: tuple[int, int], mode: str = "average"
) -> jnp.ndarray:
    """[N, grid*grid, C] -> [N, ph*pw, C].

    mode 'average' = adaptive average (the reference's vision-inside path);
    'max' / 'stride_average' = kernel-s stride-s pooling (post-projector path,
    s = grid // out)."""
    N, T, C = tokens.shape
    assert T == grid * grid, (T, grid)
    x = tokens.reshape(N, grid, grid, C)
    if mode == "average":
        y = adaptive_avg_pool_grid(x, out_hw)
    elif mode in ("max", "stride_average"):
        s = grid // out_hw[0]
        trim = out_hw[0] * s
        xw = x[:, :trim, :trim, :].reshape(N, out_hw[0], s, out_hw[1], s, C)
        y = xw.max(axis=(2, 4)) if mode == "max" else xw.mean(axis=(2, 4))
    else:
        raise ValueError(f"unknown pooling mode {mode}")
    return y.reshape(N, out_hw[0] * out_hw[1], C).astype(tokens.dtype)

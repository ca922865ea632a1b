"""Device-side frame preprocessing: fused letterbox-resize + normalize.

The reference letterboxes every frame on the host with cv2
(`/root/reference/data/stream.py:147-167`, `data/utils.py:162-185`) before
shipping float tensors to the accelerator. Here the host ships RAW decoded
uint8 frames (4x less PCIe/ICI traffic than f32, no host resize CPU) and the
TPU does aspect-preserving bilinear resize + centered zero-pad + model
normalization in one fused XLA region — with 8 concurrent streams the host
decode budget is the wall (SURVEY §7 hard part #5), so moving resize off the
host is what keeps decode ahead of scoring.

Geometry matches data/media.resize_and_pad_frame exactly
(media.letterbox_params is the shared source of truth); interpolation is
half-pixel bilinear = cv2.INTER_LINEAR (values may differ by <=1/255 from
cv2's fixed-point arithmetic — see tests/test_preprocess.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from aha_tpu.data.media import letterbox_params


def device_letterbox(
    frames: jnp.ndarray,      # [N, H, W, 3] uint8 (or float pixel values)
    output_size: int,
    *,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """[N, H, W, 3] any source size -> [N, S, S, 3] letterboxed pixel values
    (still 0..255 — feed to the tower's preprocess_frames for
    normalization, which XLA fuses into this same region)."""
    N, H, W, _ = frames.shape
    if (H, W) == (output_size, output_size):
        return frames.astype(dtype)
    new_h, new_w, top, left = letterbox_params(H, W, output_size)
    # antialias=False: cv2.INTER_LINEAR does plain half-pixel bilinear
    # without the low-pass filter jax applies by default when downscaling
    x = jax.image.resize(frames.astype(jnp.float32), (N, new_h, new_w, 3),
                         method="linear", antialias=False)
    x = jnp.clip(x, 0.0, 255.0)
    pad_h = (top, output_size - new_h - top)
    pad_w = (left, output_size - new_w - left)
    return jnp.pad(x, ((0, 0), pad_h, pad_w, (0, 0))).astype(dtype)

"""Device letterbox vs the host cv2 path (pixel parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from aha_tpu.data.media import resize_and_pad_frame
from aha_tpu.ops.preprocess import device_letterbox

cv2 = pytest.importorskip("cv2")


@pytest.mark.parametrize("hw", [(480, 640), (640, 360), (100, 100), (384, 384)])
def test_device_letterbox_matches_cv2(hw):
    h, w = hw
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (3, h, w, 3), dtype=np.uint8)
    ref = np.stack([resize_and_pad_frame(f, 384) for f in frames]).astype(np.float32)
    ours = np.asarray(device_letterbox(jnp.asarray(frames), 384))
    assert ours.shape == ref.shape
    # same geometry: the pad bands are all-zero in both
    from aha_tpu.data.media import letterbox_params

    nh, nw, top, left = letterbox_params(h, w, 384)
    band = np.ones((384, 384), bool)
    band[top:top + nh, left:left + nw] = False
    assert np.all(ours[:, band] == 0.0)
    assert np.all(ref[:, band] == 0.0)
    # bilinear values: cv2 uses fixed-point INTER_LINEAR; ours float — within
    # ~1.5 uint8 level everywhere, tiny mean error
    diff = np.abs(ours - ref)
    assert diff.max() <= 2.0, diff.max()
    assert diff.mean() < 0.3, diff.mean()


def test_visual_embed_accepts_raw_frames():
    """visual_embed letterboxes non-square raw frames on device."""
    import jax

    from aha_tpu import config as C
    from aha_tpu.models import aha

    cfg = C.aha_tiny(vocab_size=128)
    params = aha.init_aha_params(cfg, jax.random.PRNGKey(0))
    raw = np.random.default_rng(1).integers(0, 255, (2, 24, 48, 3), np.uint8)
    out = aha.visual_embed(params, cfg, jnp.asarray(raw))
    assert out.shape == (2, cfg.frame_num_tokens, cfg.llm.hidden_size)
    # equal to host-letterboxed input within interpolation tolerance
    host = np.stack([resize_and_pad_frame(f, cfg.frame_resolution) for f in raw])
    out2 = aha.visual_embed(params, cfg, jnp.asarray(host))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=2e-2, atol=2e-2)

"""Native libav decoder tests: parity with the cv2 path on synthetic video."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aha_tpu import native
from aha_tpu.data import media


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    path = tmp_path_factory.mktemp("nat") / "test.mp4"
    fps, n, size = 10.0, 40, (128, 96)
    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    for i in range(n):
        frame = np.zeros((size[1], size[0], 3), np.uint8)
        frame[:, :, 0] = (i * 6) % 256       # B ramp encodes frame index
        frame[10:30, 10:50] = (0, 255, 0)
        out.write(frame)
    out.release()
    return str(path)


needs_native = pytest.mark.skipif(not native.available(), reason="native decoder not built")


@needs_native
def test_probe_matches_cv2(video):
    v = native.NativeVideo(video)
    assert v.fps == pytest.approx(10.0, rel=0.01)
    assert (v.width, v.height) == (128, 96)
    assert v.duration == pytest.approx(4.0, rel=0.05)
    v.close()


@needs_native
def test_native_matches_cv2_decode(video):
    frames_cv, idx_cv = media.decode_video(video, output_fps=2.0, output_size=64)
    frames_nat, idx_nat = native.decode_video_native(video, output_fps=2.0, output_size=64)
    assert idx_nat == idx_cv
    assert frames_nat.shape == frames_cv.shape
    # same frames selected; letterbox geometry identical; pixel values may
    # differ slightly (swscale vs cv2 interpolation) — compare structurally
    diff = np.abs(frames_nat.astype(int) - frames_cv.astype(int)).mean()
    assert diff < 8.0, diff
    # letterbox bars: top/bottom rows black in both
    assert frames_nat[0, 0].sum() == 0 and frames_nat[0, -1].sum() == 0


@needs_native
def test_native_streaming_chunks(video):
    full, idx_full = native.decode_video_native(video, output_fps=5.0, output_size=64)
    v = native.NativeVideo(video)
    a, ia = v.decode(output_fps=5.0, output_size=64, max_frames=7)
    b, ib = v.decode(output_fps=5.0, output_size=64, max_frames=100)
    v.close()
    np.testing.assert_array_equal(np.concatenate([a, b]), full)
    assert ia + ib == idx_full


@needs_native
def test_native_max_frames(video):
    frames, idx = native.decode_video_native(video, output_fps=10.0, output_size=32,
                                             max_frames=5)
    assert frames.shape[0] == 5 and idx == [0, 1, 2, 3, 4]

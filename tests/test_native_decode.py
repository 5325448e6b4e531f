"""Native C++ ffmpeg decoder tests (skipped when the .so isn't built)."""

import numpy as np
import pytest

from aigv_assessor_tpu.data import native_decode


def _make_mp4(path, n_frames=30, w=64, h=48, fps=10):
    import cv2

    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    vw = cv2.VideoWriter(str(path), fourcc, fps, (w, h))
    assert vw.isOpened()
    for i in range(n_frames):
        frame = np.full((h, w, 3), 0, np.uint8)
        frame[:, :, 2] = min(255, i * 8)  # red ramp encodes the frame index
        vw.write(frame)
    vw.release()


needs_lib = pytest.mark.skipif(
    not native_decode.available(), reason="libvideodec.so not built"
)


@needs_lib
class TestNativeDecode:
    def test_probe(self, tmp_path):
        p = tmp_path / "v.mp4"
        _make_mp4(p, n_frames=30, fps=10)
        n, fps = native_decode.probe(str(p))
        assert n == 30
        assert abs(fps - 10) < 0.5

    def test_sample_frames_matches_cv2(self, tmp_path):
        p = tmp_path / "v.mp4"
        _make_mp4(p, n_frames=40)
        frames = native_decode.sample_frames(str(p), num_segments=8)
        assert len(frames) == 8
        assert frames[0].shape == (48, 64, 3)
        # red channel must be monotonically increasing across sampled frames
        reds = [int(f[:, :, 0].mean()) for f in frames]
        assert reds == sorted(reds)
        assert reds[-1] > reds[0] + 50

    def test_fused_resize(self, tmp_path):
        p = tmp_path / "v.mp4"
        _make_mp4(p, n_frames=16)
        frames = native_decode.sample_frames(
            str(p), num_segments=4, out_size=(32, 24)
        )
        assert frames[0].shape == (24, 32, 3)

    def test_short_video_repeats_last(self, tmp_path):
        p = tmp_path / "v.mp4"
        _make_mp4(p, n_frames=3)
        frames = native_decode.sample_frames(str(p), num_segments=8)
        assert len(frames) == 8

    def test_pipeline_uses_native(self, tmp_path):
        """read_video_frames must route through the native decoder when
        available."""
        from aigv_assessor_tpu.data.video import read_video_frames

        p = tmp_path / "v.mp4"
        _make_mp4(p, n_frames=20)
        frames = read_video_frames(str(p), num_segments=4)
        assert len(frames) == 4
        assert frames[0].size == (64, 48)

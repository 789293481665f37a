"""Video-file ingestion fallbacks (viditq_tpu.data.video_io): synthesized
y4m / MJPEG-AVI / GIF files must round-trip through decode_video and the
dataset path (reference ingests videos via torchvision.io,
t2v/opensora/datasets/datasets.py:38-116)."""

import io
import struct

import numpy as np
import pytest

from viditq_tpu.data.video_io import (decode_video, read_mjpeg_avi,
                                      read_pil_frames, read_y4m)
from viditq_tpu.data.datasets import load_video


def _frames(t=4, h=16, w=16):
    rng = np.random.default_rng(0)
    # blocky content so JPEG survives roughly intact
    base = rng.integers(0, 255, (t, h // 4, w // 4, 3), np.uint8)
    return np.repeat(np.repeat(base, 4, axis=1), 4, axis=2)


def _rgb_to_yuv420(frame):
    f = frame.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 16 + (65.481 * r + 128.553 * g + 24.966 * b) / 255.0
    u = 128 + (-37.797 * r - 74.203 * g + 112.0 * b) / 255.0
    v = 128 + (112.0 * r - 93.786 * g - 18.214 * b) / 255.0
    y = np.clip(y, 0, 255).astype(np.uint8)
    u = np.clip(u[::2, ::2], 0, 255).astype(np.uint8)
    v = np.clip(v[::2, ::2], 0, 255).astype(np.uint8)
    return y, u, v


def write_y4m(path, frames):
    t, h, w, _ = frames.shape
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode())
        for fr in frames:
            y, u, v = _rgb_to_yuv420(fr)
            f.write(b"FRAME\n")
            f.write(y.tobytes() + u.tobytes() + v.tobytes())


def write_mjpeg_avi(path, frames):
    """Minimal RIFF/AVI: just a movi LIST of 00dc JPEG chunks (the header
    lists are optional for our parser, which walks chunks)."""
    from PIL import Image

    chunks = b""
    for fr in frames:
        buf = io.BytesIO()
        Image.fromarray(fr).save(buf, format="JPEG", quality=95)
        data = buf.getvalue()
        chunks += b"00dc" + struct.pack("<I", len(data)) + data
        if len(data) & 1:
            chunks += b"\x00"
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    riff = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVI " + movi
    with open(path, "wb") as f:
        f.write(riff)


def write_gif(path, frames):
    from PIL import Image
    ims = [Image.fromarray(fr) for fr in frames]
    ims[0].save(path, save_all=True, append_images=ims[1:], duration=40,
                loop=0)


def test_y4m_roundtrip(tmp_path):
    frames = _frames()
    p = tmp_path / "clip.y4m"
    write_y4m(str(p), frames)
    out = read_y4m(str(p))
    assert out.shape == frames.shape
    # limited-range YCbCr 4:2:0 round trip: lossy but close on flat blocks
    assert np.mean(np.abs(out.astype(int) - frames.astype(int))) < 8.0
    assert decode_video(str(p)).shape == frames.shape
    assert read_y4m(str(p), max_frames=2).shape[0] == 2


def test_mjpeg_avi_roundtrip(tmp_path):
    frames = _frames()
    p = tmp_path / "clip.avi"
    write_mjpeg_avi(str(p), frames)
    out = read_mjpeg_avi(str(p))
    assert out.shape == frames.shape
    # JPEG 4:2:0 chroma subsampling on random colors: lossier than y4m
    assert np.mean(np.abs(out.astype(int) - frames.astype(int))) < 20.0
    assert decode_video(str(p), max_frames=3).shape[0] == 3


def test_gif_roundtrip(tmp_path):
    frames = _frames()
    p = tmp_path / "clip.gif"
    write_gif(str(p), frames)
    out = read_pil_frames(str(p))
    assert out.shape == frames.shape  # palette-lossy; shape check only


def test_dataset_load_video_from_file(tmp_path):
    frames = _frames(t=6)
    p = tmp_path / "clip.y4m"
    write_y4m(str(p), frames)
    x = load_video(str(p), num_frames=4, size=(8, 8))
    assert x.shape == (3, 4, 8, 8)
    assert x.dtype == np.float32
    assert -1.0 <= x.min() and x.max() <= 1.0


def test_unknown_codec_raises(tmp_path):
    p = tmp_path / "clip.mp4"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError, match="ffmpeg"):
        decode_video(str(p))

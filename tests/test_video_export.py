"""Video export tests — the pure-Python MJPEG-AVI fallback (reference encode
analog, ``run.py:127-133``; this environment has no ffmpeg/av). Host-only:
no JAX involved."""

import struct

import numpy as np

from alg_tpu.io.video import write_mjpeg_avi, write_video


def _frames(f=5, h=24, w=32):
    rng = np.random.RandomState(0)
    return (rng.rand(f, h, w, 3) * 255).astype(np.uint8)


def test_mjpeg_avi_structure(tmp_path):
    arr = _frames()
    path = str(tmp_path / "clip.avi")
    out = write_mjpeg_avi(path, arr, fps=8)
    data = open(out, "rb").read()

    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    riff_size = struct.unpack("<I", data[4:8])[0]
    assert riff_size == len(data) - 8  # exact RIFF sizing

    # header list with avih; stream MJPG; movi with one 00dc per frame; idx1
    assert b"hdrl" in data[:200] and b"avih" in data[:200]
    assert b"vids" in data[:400] and b"MJPG" in data[:400]
    assert data.count(b"00dc") == 2 * arr.shape[0]  # movi chunks + idx1 rows
    assert b"idx1" in data

    # avih: frame count and geometry round-trip
    i = data.index(b"avih") + 8
    avih = struct.unpack("<14I", data[i : i + 56])
    assert avih[4] == arr.shape[0]  # dwTotalFrames
    assert (avih[8], avih[9]) == (arr.shape[2], arr.shape[1])  # w, h

    # every 00dc movi chunk payload is a JPEG (SOI marker)
    j = data.index(b"movi")
    pos = j + 4
    for _ in range(arr.shape[0]):
        assert data[pos : pos + 4] == b"00dc"
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        payload = data[pos + 8 : pos + 8 + size]
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        pos += 8 + size + (size % 2)


def test_write_video_fallback_is_avi(tmp_path, monkeypatch):
    # simulate no ffmpeg even if one exists
    import alg_tpu.io.video as vid

    monkeypatch.setattr(vid.shutil, "which", lambda name: None)
    out = write_video(str(tmp_path / "out.mp4"), _frames(), fps=8)
    assert out.endswith(".avi")
    assert (tmp_path / "out.avi").stat().st_size > 0


def test_write_video_explicit_gif(tmp_path, monkeypatch):
    import alg_tpu.io.video as vid

    monkeypatch.setattr(vid.shutil, "which", lambda name: None)
    out = write_video(str(tmp_path / "out.gif"), _frames(), fps=8)
    assert out.endswith(".gif")
    assert (tmp_path / "out.gif").stat().st_size > 0

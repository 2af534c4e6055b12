"""Video-container frame sampling without pyav/ffmpeg: animated GIF
(composited canvases, GCE transparency + disposal) and motion-JPEG AVI
(RIFF walk + the numpy JPEG decoder)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.jpeg import encode_jpeg
from etl_rs_ray.stages.multimodal import (
    SampleFrames,
    _avi_mjpeg_frames,
    _gif_frames,
    encode_avi_mjpeg,
    encode_gif,
)

PAL = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)


def _multi_frame_gif(frames_idx, pal, gce=None):
    """Concatenate single-frame encodings into one animation; ``gce``
    optionally maps frame index -> raw 4-byte GCE body (flags, delay lo,
    delay hi, transparent index)."""
    bits = max(2, int(np.ceil(np.log2(max(len(pal), 2)))))
    gct_bytes = (1 << bits) * 3
    body = bytearray(encode_gif(frames_idx[0], pal)[:-1])  # strip trailer
    if gce and 0 in gce:
        # insert the first frame's GCE before its image descriptor
        off = 13 + gct_bytes
        body[off:off] = b"\x21\xf9\x04" + gce[0] + b"\x00"
    for i, f in enumerate(frames_idx[1:], start=1):
        single = encode_gif(f, pal)
        if gce and i in gce:
            body += b"\x21\xf9\x04" + gce[i] + b"\x00"
        body += single[13 + gct_bytes : -1]
    body.append(0x3B)
    return bytes(body)


def test_animation_frames_pixel_exact():
    rng = np.random.default_rng(4)
    frames_idx = [rng.integers(0, 4, (6, 8), dtype=np.uint8) for _ in range(5)]
    g = _multi_frame_gif(frames_idx, PAL)
    out = list(_gif_frames(g))
    assert len(out) == 5
    for f, idx in zip(out, frames_idx):
        np.testing.assert_array_equal(f, PAL[idx])


def test_gif_transparency_composites_over_previous():
    base = np.zeros((4, 4), dtype=np.uint8)  # all red
    overlay = np.full((4, 4), 3, dtype=np.uint8)
    overlay[0, :] = 1  # top row green, rest "transparent" (index 3)
    g = _multi_frame_gif(
        [base, overlay], PAL, gce={1: bytes([0x01, 0, 0, 3])}  # transparent idx 3
    )
    f1, f2 = list(_gif_frames(g))
    np.testing.assert_array_equal(f1, PAL[base])
    want = PAL[base].copy()
    want[0, :] = PAL[1]  # only the opaque row lands
    np.testing.assert_array_equal(f2, want)


def test_gif_disposal_restore_background():
    # frame 1 draws, disposal=2 restores bg before frame 2's transparent
    # overlay -> frame 2 shows bg where the overlay is transparent
    f1 = np.full((4, 4), 2, dtype=np.uint8)  # blue
    f2 = np.full((4, 4), 3, dtype=np.uint8)  # fully transparent overlay
    g = _multi_frame_gif(
        [f1, f2],
        PAL,
        gce={0: bytes([0x08 | 0x01, 0, 0, 3]), 1: bytes([0x01, 0, 0, 3])},
        # frame 0: disposal=2 (0x08) + transparency flag; frame 1: transparent idx 3
    )
    out = list(_gif_frames(g))
    # encode_gif sets the screen background index to 0 (red)
    np.testing.assert_array_equal(out[1], np.broadcast_to(PAL[0], (4, 4, 3)))


def _mjpeg_fixture(n=7, w=24, h=16):
    yy, xx = np.mgrid[0:h, 0:w]
    imgs = [(128 + 60 * np.sin(xx / 5 + t)).clip(0, 255).astype(np.uint8) for t in range(n)]
    return imgs, [encode_jpeg(im, quality=95) for im in imgs]


def test_avi_roundtrip_and_word_alignment():
    imgs, jpegs = _mjpeg_fixture()
    avi = encode_avi_mjpeg(jpegs, 24, 16)
    assert _avi_mjpeg_frames(avi) == jpegs
    # odd-length frames force the word-alignment padding path
    odd = [j + b"\x00" if len(j) % 2 == 0 else j for j in jpegs]
    assert all(len(j) % 2 == 1 for j in odd)
    assert _avi_mjpeg_frames(encode_avi_mjpeg(odd, 24, 16)) == odd


def test_avi_rejects_non_mjpeg():
    with pytest.raises(ValueError):
        _avi_mjpeg_frames(b"RIFF\x00\x00\x00\x00WAVE")
    # dc chunks that are not JPEG
    bogus = encode_avi_mjpeg([b"\xff\xd8ok"], 2, 2).replace(b"\xff\xd8ok", b"nojpg!")
    with pytest.raises(ValueError):
        _avi_mjpeg_frames(bogus)


def test_sample_frames_stage_gif_and_avi():
    rng = np.random.default_rng(7)
    frames_idx = [rng.integers(0, 4, (6, 8), dtype=np.uint8) for _ in range(5)]
    g = _multi_frame_gif(frames_idx, PAL)
    imgs, jpegs = _mjpeg_fixture()
    avi = encode_avi_mjpeg(jpegs, 24, 16)
    batch = pa.table(
        {
            "media_type": pa.array(["video", "video", "video"]),
            "payload": pa.array([g, avi, b"not video"], pa.binary()),
        }
    )
    out = SampleFrames(every_n=2, strict=False)(batch)
    offs = out.column("frame_offsets").to_pylist()
    lumas = out.column("frame_lumas").to_pylist()
    assert offs[0] == [0, 2, 4] and offs[1] == [0, 2, 4, 6]
    # GIF lumas match the composited pixels exactly
    for luma, fi in zip(lumas[0], frames_idx[::2]):
        rgb = PAL[fi].astype(np.float64)
        want = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]).mean()
        assert luma == pytest.approx(want, abs=1e-9)
    # AVI lumas approximate the source frames (JPEG is lossy)
    for luma, im in zip(lumas[1], imgs[::2]):
        assert luma == pytest.approx(float(im.mean()), abs=2.0)
    # strict over real containers must not raise; over garbage it must
    strict = SampleFrames(every_n=2, strict=True)
    strict(batch.slice(0, 2))
    with pytest.raises(NotImplementedError):
        strict(batch.slice(2, 1))

"""MPEG audio frame-walk metadata (stages/mpeg_audio.py).

The real-world anchor is the OS-shipped test.mp3 (a third-party
encoder's MPEG-2 LSF Layer III stream): the walk must land EXACTLY on
end-of-file — every frame size computed from its own header placing the
next sync word — which validates the frame-length arithmetic against
bytes we did not write. Synthetic streams cover the other versions,
layers, padding alternation, Xing/VBR tagging, and tag skipping.
"""

import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.mpeg_audio import (
    _parse_header,
    _skip_id3,
    _xing_offset,
    encode_cbr_stream,
    is_mpeg_audio,
    mpeg_audio_metadata,
)
from etl_rs_ray.stages.multimodal import DecodeAudio

REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


def test_real_world_mp3_walks_to_exact_eof():
    if not os.path.exists(REAL_MP3):
        pytest.skip("gsutil test mp3 not present")
    payload = open(REAL_MP3, "rb").read()
    assert is_mpeg_audio(payload)
    start, end = _skip_id3(payload)
    pos, n = start, 0
    while pos + 4 <= end:
        h = _parse_header(payload[pos : pos + 4])
        assert h is not None, f"lost sync at {pos} after {n} frames"
        n += 1
        pos += h[-1]
    assert pos == end  # computed sizes land exactly on EOF
    meta = mpeg_audio_metadata(payload)
    assert meta == {
        "version": "2",
        "layer": 3,
        "sample_rate": 22050,
        "channels": 1,
        "frame_count": 45,
        "duration_s": pytest.approx(45 * 576 / 22050),
        "bitrate_kbps": 64.0,
        "vbr": False,
        "xing_frames": None,
    }
    # independent duration cross-check: CBR payload bytes / byte rate
    assert meta["duration_s"] == pytest.approx((end - start) * 8 / 64000, rel=0.02)


@pytest.mark.parametrize(
    "version_bits,layer,sr_idx,samples",
    [
        (3, 1, 0, 384),  # MPEG-1 Layer I @44100
        (3, 2, 1, 1152),  # MPEG-1 Layer II @48000
        (3, 3, 2, 1152),  # MPEG-1 Layer III @32000
        (2, 3, 0, 576),  # MPEG-2 Layer III @22050
        (0, 3, 2, 576),  # MPEG-2.5 Layer III @8000
    ],
)
def test_synthetic_streams_all_versions(version_bits, layer, sr_idx, samples):
    blob = encode_cbr_stream(
        12, version_bits=version_bits, layer=layer, sr_idx=sr_idx, mono=True
    )
    assert is_mpeg_audio(blob)
    m = mpeg_audio_metadata(blob)
    assert m["frame_count"] == 12
    assert m["layer"] == layer
    assert m["channels"] == 1
    assert not m["vbr"]
    assert m["duration_s"] == pytest.approx(12 * samples / m["sample_rate"])


def test_padding_alternation_and_stereo():
    blob = encode_cbr_stream(20, pad_alternate=True, mono=False)
    m = mpeg_audio_metadata(blob)
    assert m["frame_count"] == 20 and m["channels"] == 2 and not m["vbr"]


def test_id3v2_and_id3v1_tags_skipped():
    audio = encode_cbr_stream(8, mono=True)
    size = 200
    id3v2 = b"ID3\x04\x00\x00" + bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    ) + b"\0" * size
    id3v1 = b"TAG" + b"\0" * 125
    tagged = id3v2 + audio + id3v1
    assert is_mpeg_audio(tagged)
    assert mpeg_audio_metadata(tagged)["frame_count"] == 8


def test_xing_vbr_tag_recognised_and_cross_checked():
    frames = encode_cbr_stream(10, version_bits=3, layer=3, sr_idx=0, mono=True)
    blob = bytearray(frames)
    # plant a Xing tag with the frames-field inside frame 1's side info
    xo = _xing_offset(3, 1)
    blob[xo : xo + 12] = b"Xing" + struct.pack(">II", 1, 10)
    m = mpeg_audio_metadata(bytes(blob))
    assert m["vbr"] is True
    assert m["xing_frames"] == 10 == m["frame_count"]
    # an 'Info' tag (CBR written by LAME) must NOT flag vbr
    blob[xo : xo + 4] = b"Info"
    m2 = mpeg_audio_metadata(bytes(blob))
    assert m2["vbr"] is False and m2["xing_frames"] == 10


def test_rejects_non_mpeg_bytes():
    assert not is_mpeg_audio(b"")
    assert not is_mpeg_audio(b"\xff\xfb")  # sync alone, no walkable frame
    assert not is_mpeg_audio(b"RIFF....WAVE")
    assert not is_mpeg_audio(np.arange(256, dtype=np.uint8).tobytes())
    with pytest.raises(ValueError):
        mpeg_audio_metadata(b"not audio at all")
    # sync word whose successor frame fails to parse -> rejected
    bad = b"\xff\xfb\x90\x04" + b"\0" * 1000
    assert not is_mpeg_audio(bad)


def test_decode_audio_stage_mp3_metadata_path():
    if not os.path.exists(REAL_MP3):
        pytest.skip("gsutil test mp3 not present")
    payload = open(REAL_MP3, "rb").read()
    batch = pa.table(
        {
            "media_type": pa.array(["audio", "audio"]),
            "payload": pa.array([payload, b"\0\0\0 opaque"], pa.binary()),
        }
    )
    out = DecodeAudio(strict=False)(batch)
    assert out.column("sample_rate").to_pylist() == [22050, None]
    assert out.column("duration_s").to_pylist()[0] == pytest.approx(45 * 576 / 22050)
    assert out.column("rms").to_pylist() == [None, None]  # honest null: no sample decode
    # strict: MP3 metadata path still works; opaque bytes raise
    strict = DecodeAudio(strict=True)
    ok = pa.table(
        {"media_type": pa.array(["audio"]), "payload": pa.array([payload], pa.binary())}
    )
    assert strict(ok).column("sample_rate").to_pylist() == [22050]
    with pytest.raises(NotImplementedError):
        strict(
            pa.table(
                {
                    "media_type": pa.array(["audio"]),
                    "payload": pa.array([b"\0\0 opaque"], pa.binary()),
                }
            )
        )


def test_media_pipeline_every_real_codec_strict():
    """ONE distributed strict-mode media_pipeline run over every codec
    the stages decode for real — BMP, netpbm, PNG, GIF, baseline JPEG,
    TIFF (LZW+predictor), PCM WAV, MPEG audio, Y4M, animated GIF,
    MJPEG AVI — no stub fallback permitted anywhere."""
    import ray

    from etl_rs_ray.stages.jpeg import encode_jpeg
    from etl_rs_ray.stages.multimodal import (
        encode_avi_mjpeg,
        encode_bmp,
        encode_gif,
        encode_png,
        encode_ppm,
        encode_tiff,
        encode_wav,
        encode_y4m,
    )

    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
    gray = px[:, :, 0]
    palette = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    indices = rng.integers(0, 8, (12, 16), dtype=np.uint8)
    wav = encode_wav((rng.standard_normal(500) * 8000).astype(np.int16), 8000)
    mp3 = encode_cbr_stream(10, version_bits=2, layer=3, sr_idx=0, mono=True)
    frames = rng.integers(0, 256, (4, 8, 8), dtype=np.uint8)
    jpeg_frame = encode_jpeg(np.repeat(gray[:, :, None], 3, axis=2))
    rows = [
        ("image", encode_bmp(px)),
        ("image", encode_ppm(px)),
        ("image", encode_png(px, filter_type=4)),
        ("image", encode_gif(indices, palette)),
        ("image", encode_jpeg(px)),
        ("image", encode_tiff(px, compression=5, predictor=2)),
        ("audio", wav),
        ("audio", mp3),
        ("video", encode_y4m(frames)),
        ("video", encode_avi_mjpeg([jpeg_frame, jpeg_frame], 16, 12)),
    ]
    t = pa.table(
        {
            "media_id": pa.array(range(len(rows)), pa.int64()),
            "media_type": pa.array([r[0] for r in rows]),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )

    # DecodeImage decodes every payload it sees (fake dims for non-image
    # rows by design), so strict mode must only meet its own media type:
    # route each type through its strict stage as a separate Dataset
    import pyarrow.compute as pc

    import etl_rs_ray.stages.multimodal as mm

    def subset(mt):
        return ray.data.from_arrow(t.filter(pc.equal(t.column("media_type"), mt))).repartition(2)

    images = subset("image").map_batches(
        lambda b: mm.DecodeImage(strict=True)(b), batch_format="pyarrow", batch_size=4
    )
    audio = subset("audio").map_batches(
        lambda b: mm.DecodeAudio(strict=True)(b), batch_format="pyarrow", batch_size=4
    )
    video = subset("video").map_batches(
        lambda b: mm.SampleFrames(strict=True)(b), batch_format="pyarrow", batch_size=4
    )
    out = {}
    for d in (images, audio, video):
        for r in d.take_all():
            out[r["media_id"]] = r
    assert len(out) == len(rows)
    for i in range(6):  # every image row got REAL dims
        assert out[i]["width"] == 16 and out[i]["height"] == 12
    assert out[6]["sample_rate"] == 8000 and out[6]["rms"] > 0
    assert out[7]["sample_rate"] == 22050 and out[7]["rms"] is None
    assert out[7]["duration_s"] == pytest.approx(10 * 576 / 22050)
    assert len(out[8]["frame_offsets"]) >= 1 and out[8]["frame_lumas"] is not None
    assert len(out[9]["frame_offsets"]) >= 1

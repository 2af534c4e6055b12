"""Real PNG decode (stdlib zlib + numpy — no Pillow).

The unfilter paths are exercised against each other: the SAME image
encoded under every scanline filter type (0=None, 1=Sub, 2=Up,
3=Average, 4=Paeth) must decode to identical pixels — the filters are
independent encodings, so agreement pins the reconstruction math, not
just a roundtrip of one code path. A hand-built byte-level fixture pins
the container format (chunk layout, CRC, IHDR) independently of the
encoder."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.multimodal import (
    DecodeImage,
    _PNG_MAGIC,
    _png_pixels,
    decode_png,
    encode_png,
    is_png,
)


def _rand(shape, seed):
    return np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_all_filters_decode_to_identical_pixels(channels):
    shape = (13, 7) if channels == 1 else (13, 7, channels)
    px = _rand(shape, seed=channels)
    want = px if channels > 1 else px[..., None]
    decoded = [
        _png_pixels(encode_png(px, filter_type=f)) for f in range(5)
    ]
    for d in decoded:
        np.testing.assert_array_equal(d, want)


def test_palette_pixels_resolve_through_plte():
    # build a paletted PNG by hand: indices 0..3 -> 4 RGB entries
    lut = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8)
    idx = _rand((9, 5), seed=3) % 4

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 5, 9, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[r].tobytes() for r in range(9))
    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", lut.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert is_png(payload)
    np.testing.assert_array_equal(_png_pixels(payload), lut[idx])


def test_decode_png_luma_matches_numpy():
    px = _rand((6, 11, 3), seed=7)
    w, h, luma = decode_png(encode_png(px))
    assert (w, h) == (11, 6)
    want = (
        0.299 * px[..., 0].astype(np.float64)
        + 0.587 * px[..., 1]
        + 0.114 * px[..., 2]
    ).mean()
    assert luma == pytest.approx(float(want), abs=1e-12)
    # grayscale: plain mean
    g = _rand((4, 4), seed=8)
    _, _, gl = decode_png(encode_png(g))
    assert gl == pytest.approx(float(g.mean()), abs=1e-12)
    # alpha excluded from luma
    ga = _rand((4, 4, 2), seed=9)
    _, _, gal = decode_png(encode_png(ga))
    assert gal == pytest.approx(float(ga[..., 0].mean()), abs=1e-12)


def test_handbuilt_fixture_bytes():
    """Byte-level pinned 2x2 RGB PNG (filter 0), independent of encode_png."""

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
        )

    # rows: (255,0,0)(0,255,0) / (0,0,255)(255,255,255)
    raw = b"\x00" + bytes([255, 0, 0, 0, 255, 0]) + b"\x00" + bytes(
        [0, 0, 255, 255, 255, 255]
    )
    payload = (
        _PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, luma = decode_png(payload)
    assert (w, h) == (2, 2)
    # luma = mean of BT.601 over the 4 pixels
    want = (0.299 * 255 + 0.587 * 255 + 0.114 * 255 + 255.0) / 4
    assert luma == pytest.approx(want, abs=1e-9)


def test_multiple_idat_chunks_concatenate():
    px = _rand((8, 8, 3), seed=10)
    payload = encode_png(px, filter_type=2)
    # split the single IDAT into two chunks; stream must still decode
    sig_end = 8
    (ihdr_len,) = struct.unpack_from(">I", payload, sig_end)
    idat_start = sig_end + 12 + ihdr_len
    (idat_len,) = struct.unpack_from(">I", payload, idat_start)
    data = payload[idat_start + 8 : idat_start + 8 + idat_len]
    rest = payload[idat_start + 12 + idat_len :]

    def chunk(ctype, d):
        return struct.pack(">I", len(d)) + ctype + d + struct.pack(
            ">I", zlib.crc32(ctype + d) & 0xFFFFFFFF
        )

    cut = len(data) // 2
    rebuilt = (
        payload[:idat_start]
        + chunk(b"IDAT", data[:cut])
        + chunk(b"IDAT", data[cut:])
        + rest
    )
    np.testing.assert_array_equal(_png_pixels(rebuilt), px)


def test_is_png_rejects_invalid():
    good = encode_png(_rand((4, 4, 3), seed=1))
    assert is_png(good)
    assert not is_png(b"not a png")
    assert not is_png(_PNG_MAGIC + b"garbage after magic")
    assert not is_png(good[:-7])  # truncated
    # flipped pixel byte -> CRC mismatch
    bad_crc = bytearray(good)
    bad_crc[45] ^= 0xFF
    assert not is_png(bytes(bad_crc))
    # depth byte flipped to 16 on 8-bit-sized data -> length mismatch
    deep = bytearray(good)
    deep[24] = 16  # IHDR bit-depth byte
    # fix IHDR CRC so only the pixel-data validation can reject
    ihdr = bytes(deep[12:16]) + bytes(deep[16:29])
    struct.pack_into(">I", deep, 29, zlib.crc32(ihdr) & 0xFFFFFFFF)
    assert not is_png(bytes(deep))
    # illegal combination: color type 2 at depth 4
    combo = bytearray(good)
    combo[24] = 4
    ihdr = bytes(combo[12:16]) + bytes(combo[16:29])
    struct.pack_into(">I", combo, 29, zlib.crc32(ihdr) & 0xFFFFFFFF)
    assert not is_png(bytes(combo))


def _chunk(ctype, data):
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(
        ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF
    )


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_grayscale_depths(depth):
    # hand-packed filter-0 scanlines at sub-byte depth
    maxv = (1 << depth) - 1
    vals = np.array([[i % (maxv + 1) for i in range(7)] for _ in range(3)], dtype=np.uint8)
    rows = []
    for r in range(3):
        bits = np.zeros(7 * depth, dtype=np.uint8)
        for i, v in enumerate(vals[r]):
            for b in range(depth):
                bits[i * depth + b] = (v >> (depth - 1 - b)) & 1
        rows.append(b"\x00" + np.packbits(bits).tobytes())
    payload = (
        _PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 3, depth, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    got = _png_pixels(payload)[..., 0]
    np.testing.assert_array_equal(got, vals * (255 // maxv))


def test_16bit_keeps_high_byte():
    hi = _rand((4, 5, 3), seed=20)
    lo = _rand((4, 5, 3), seed=21)
    raw = b"".join(
        b"\x00" + np.dstack([hi[r], lo[r]]).reshape(-1).tobytes() for r in range(4)
    )
    payload = (
        _PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 4, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(_png_pixels(payload), hi)


def test_adam7_interlace_roundtrip():
    """Hand-rolled Adam7 writer (filter 0 per pass) vs the deinterlacer."""
    from etl_rs_ray.stages.multimodal import _PNG_ADAM7

    for shape in [(9, 13, 3), (8, 8, 1), (3, 2, 4), (1, 1, 1), (16, 5, 2)]:
        px = _rand(shape, seed=sum(shape))
        h, w, ch = px.shape
        stream = b""
        for x0, y0, dx, dy in _PNG_ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for r in range(sub.shape[0]):
                stream += b"\x00" + sub[r].tobytes()
        color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        payload = (
            _PNG_MAGIC
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1))
            + _chunk(b"IDAT", zlib.compress(stream))
            + _chunk(b"IEND", b"")
        )
        got = _png_pixels(payload)
        np.testing.assert_array_equal(got, px)


REAL_FILES = [
    # (path, expected w, h) — real-world third-party encoder outputs
    ("/usr/share/gitweb/static/git-favicon.png", 16, 16),  # 2-bit palette
    ("/usr/share/gitweb/static/git-logo.png", 72, 27),
    ("/usr/share/doc/python3/_static/file.png", 16, 16),
]


@pytest.mark.parametrize("path,w,h", REAL_FILES)
def test_real_world_files_decode(path, w, h):
    import os

    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    gw, gh, luma = decode_png(open(path, "rb").read())
    assert (gw, gh) == (w, h)
    assert 0.0 <= luma <= 255.0


def test_decode_image_stage_routes_png():
    px = _rand((5, 3, 3), seed=2)
    batch = pa.table(
        {
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array(
                [encode_png(px, filter_type=4), b"\xff\xd8\xffJPEG-ish"], pa.binary()
            ),
        }
    )
    out = DecodeImage(strict=False)(batch)
    assert out.column("width")[0].as_py() == 3
    assert out.column("height")[0].as_py() == 5
    # strict: real PNG decodes, non-PNG raises
    strict = DecodeImage(strict=True)
    strict(batch.slice(0, 1))
    with pytest.raises(NotImplementedError):
        strict(batch.slice(1, 1))
    # strict: corrupt PNG raises too (interlace flag flipped on
    # non-interlaced data -> pass-geometry length mismatch)
    inter = bytearray(encode_png(px))
    inter[28] = 1  # IHDR interlace byte
    ihdr = bytes(inter[12:16]) + bytes(inter[16:29])
    struct.pack_into(">I", inter, 29, zlib.crc32(ihdr) & 0xFFFFFFFF)
    bad = pa.table(
        {
            "media_type": pa.array(["image"], pa.string()),
            "payload": pa.array([bytes(inter)], pa.binary()),
        }
    )
    with pytest.raises(NotImplementedError):
        strict(bad)
    # non-strict: falls to the md5 stub, never crashes
    DecodeImage(strict=False)(bad)

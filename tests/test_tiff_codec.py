"""TIFF codec conformance (stages/tiff.py).

Three independent anchors:
- the OS-shipped python.tiff (third-party encoder, uncompressed RGBA)
  checked against a naive in-test struct parse of the raw strip;
- the PackBits worked example from the format's public specification;
- hand-built byte-level fixtures for every variant our roundtrip
  encoder does not produce (16-bit both endians, palette, WhiteIsZero,
  1/2/4-bit, tiles, multi-IFD), so the decoder is never tested only
  against its own sibling writer.
"""

import glob
import os
import struct

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.multimodal import DecodeImage
from etl_rs_ray.stages.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    decode_tiff_pixels,
    encode_tiff,
    is_tiff,
)

REAL_TIFF = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/imghdrdata/python.tiff"


# ---------------------------------------------------------------- real file


def test_real_world_tiff_matches_independent_parse():
    if not os.path.exists(REAL_TIFF):
        pytest.skip("CPython imghdr test data not present")
    payload = open(REAL_TIFF, "rb").read()
    assert is_tiff(payload)
    w, h, luma = decode_tiff(payload)
    assert (w, h) == (16, 16)
    # naive independent parse: the file is a single uncompressed RGBA
    # strip at offset 8 (verified via the IFD by hand)
    raw = np.frombuffer(payload[8 : 8 + 16 * 16 * 4], dtype=np.uint8).reshape(16, 16, 4)
    want = (0.299 * raw[:, :, 0] + 0.587 * raw[:, :, 1] + 0.114 * raw[:, :, 2]).mean()
    assert luma == pytest.approx(float(want), abs=1e-9)
    np.testing.assert_array_equal(decode_tiff_pixels(payload), raw[:, :, :3])


def test_all_real_world_tiffs_decode():
    files = sorted(
        set(glob.glob("/root/.pyenv/versions/*/lib/python*/test/**/*.tif*", recursive=True))
    )
    if not files:
        pytest.skip("no OS-shipped tiffs")
    for f in files:
        w, h, luma = decode_tiff(open(f, "rb").read())
        assert w > 0 and h > 0 and 0.0 <= luma <= 255.0


# ------------------------------------------------------- compression layers


def test_packbits_spec_worked_example():
    # the canonical worked example from the PackBits specification
    enc = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    want = bytes.fromhex("AAAAAA80002AAAAAAAAA80002A22") + b"\xaa" * 10
    assert _packbits_decode(enc, len(want)) == want
    # our encoder must roundtrip the same plaintext (encoding may differ)
    assert _packbits_decode(_packbits_encode(want), len(want)) == want


@pytest.mark.parametrize(
    "n", [0, 1, 10, 255, 256, 511, 512, 1021, 1022, 1023, 4093, 4094, 4095, 60000]
)
def test_lzw_roundtrip_width_boundaries(n):
    rng = np.random.default_rng(n + 1)
    incompressible = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(incompressible), n) == incompressible
    compressible = (b"ab" * (n // 2 + 1))[:n]
    assert _lzw_decode(_lzw_encode(compressible), n) == compressible


def test_lzw_table_full_clear():
    data = b"a" * 300_000  # drives the table to 4094 -> mid-stream Clear
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_packbits_roundtrip():
    rng = np.random.default_rng(3)
    for n in [0, 1, 5, 127, 128, 129, 1000]:
        d = rng.integers(0, 4, n, dtype=np.uint8).tobytes()
        assert _packbits_decode(_packbits_encode(d), n) == d


# ------------------------------------------------------ writer roundtrips


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("compression", [1, 5, 8, 32773])
def test_roundtrip_sweep(channels, compression):
    rng = np.random.default_rng(channels * 100 + compression)
    px = rng.integers(0, 256, (13, 17, channels), dtype=np.uint8)
    for predictor in (1, 2):
        for rows_per_strip in (None, 4):
            for big_endian in (False, True):
                for planar in (1, 2):
                    blob = encode_tiff(
                        px,
                        compression=compression,
                        predictor=predictor,
                        rows_per_strip=rows_per_strip,
                        big_endian=big_endian,
                        planar=planar,
                    )
                    np.testing.assert_array_equal(
                        decode_tiff_pixels(blob),
                        px,
                        err_msg=f"{predictor=} {rows_per_strip=} {big_endian=} {planar=}",
                    )


def test_cross_compression_agreement():
    """The same pixels through every compression/predictor must decode
    identically — the PNG suite's cross-filter invariant, for TIFF."""
    if not os.path.exists(REAL_TIFF):
        pytest.skip("CPython imghdr test data not present")
    px = decode_tiff_pixels(open(REAL_TIFF, "rb").read())
    blobs = [
        encode_tiff(px, compression=c, predictor=p)
        for c in (1, 5, 8, 32773)
        for p in (1, 2)
    ]
    for b in blobs:
        np.testing.assert_array_equal(decode_tiff_pixels(b), px)


# ------------------------------------------------- hand-built byte fixtures


def _build_tiff(entries, chunks, endian="<", chunk_tags=(273, 279)):
    """Byte-level TIFF builder independent of encode_tiff.

    entries: list of (tag, typ, value) where value is an int, a tuple of
    ints (inline if they fit, else out-of-line), or bytes (out-of-line).
    chunks: pixel chunks; their offsets/counts are appended as
    chunk_tags (strips by default, pass (324, 325) for tiles).
    """
    fmt = {1: "B", 3: "H", 4: "I"}
    size = {1: 1, 3: 2, 4: 4}

    rows = []
    for tag, typ, val in entries:
        if isinstance(val, int):
            val = (val,)
        if isinstance(val, bytes):
            rows.append((tag, typ, len(val) // size[typ], val))
        else:
            rows.append((tag, typ, len(val), struct.pack(endian + fmt[typ] * len(val), *val)))
    rows.append(
        (
            chunk_tags[1],
            4,
            len(chunks),
            struct.pack(endian + "I" * len(chunks), *[len(c) for c in chunks]),
        )
    )
    rows.append((chunk_tags[0], 4, len(chunks), None))  # offsets filled by _assemble
    rows.sort(key=lambda r: r[0])
    return _assemble(rows, chunks, endian)


def _assemble(rows, chunks, endian):
    """Two-pass assembly: first compute layout, then emit."""
    fmt = {1: "B", 3: "H", 4: "I"}
    n = len(rows)
    header = struct.pack(endian + "2sHI", b"II" if endian == "<" else b"MM", 42, 8)
    base = 8 + 2 + n * 12 + 4

    # first pass: collect all out-of-line payloads in tag order
    outline_sizes = []
    for tag, typ, cnt, raw in rows:
        if raw is None:
            raw_len = 4 * len(chunks)
        else:
            raw_len = len(raw)
        outline_sizes.append(raw_len if raw_len > 4 else 0)
    offsets_of_outline = []
    pos = base
    for s in outline_sizes:
        offsets_of_outline.append(pos if s else None)
        pos += s + (s & 1 if s else 0)
    chunk_offsets = []
    for c in chunks:
        chunk_offsets.append(pos)
        pos += len(c) + (len(c) & 1)

    out = bytearray(header)
    out += struct.pack(endian + "H", n)
    bodies = bytearray()
    for (tag, typ, cnt, raw), ooff in zip(rows, offsets_of_outline):
        if raw is None:
            raw = struct.pack(endian + "I" * len(chunks), *chunk_offsets)
        if len(raw) <= 4:
            field = raw + b"\0" * (4 - len(raw))
        else:
            field = struct.pack(endian + "I", ooff)
            bodies += raw + (b"\0" if len(raw) & 1 else b"")
        out += struct.pack(endian + "HHI", tag, typ, cnt) + field
    out += struct.pack(endian + "I", 0)
    out += bodies
    for c in chunks:
        out += c + (b"\0" if len(c) & 1 else b"")
    return bytes(out)


def _gray_entries(w, h, bits, photometric, extra=()):
    return [
        (256, 3, w),
        (257, 3, h),
        (258, 3, bits),
        (259, 3, 1),
        (262, 3, photometric),
        (277, 3, 1),
        (278, 3, h),
        *extra,
    ]


@pytest.mark.parametrize("endian", ["<", ">"])
def test_16bit_gray_both_endians(endian):
    px = np.array([[0, 1, 255], [256, 32768, 65535]], dtype=np.uint16)
    chunk = px.astype(np.dtype(endian + "u2")).tobytes()
    blob = _build_tiff(_gray_entries(3, 2, 16, 1), [chunk], endian=endian)
    got = decode_tiff_pixels(blob)
    np.testing.assert_array_equal(got[:, :, 0], px)
    w, h, luma = decode_tiff(blob)
    assert (w, h) == (3, 2)
    assert luma == pytest.approx(float(px.mean()) / 257.0)


def test_white_is_zero_inverts():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    blob = _build_tiff(_gray_entries(4, 3, 8, 0), [px.tobytes()])
    got = decode_tiff_pixels(blob)
    np.testing.assert_array_equal(got[:, :, 0], 255 - px)


@pytest.mark.parametrize("bits", [1, 2, 4])
def test_subbyte_gray_nonaligned_rows(bits):
    w, h = 11, 5  # rows not byte-aligned
    maxval = (1 << bits) - 1
    rng = np.random.default_rng(bits)
    px = rng.integers(0, maxval + 1, (h, w), dtype=np.uint8)
    # pack rows high-bit-first with per-row padding
    rows = []
    for r in range(h):
        bitstream = np.unpackbits(px[r][:, None] << (8 - bits), axis=1, count=bits).ravel()
        rows.append(np.packbits(bitstream).tobytes())
    blob = _build_tiff(_gray_entries(w, h, bits, 1), [b"".join(rows)])
    got = decode_tiff_pixels(blob)
    np.testing.assert_array_equal(got[:, :, 0], (px.astype(np.int32) * 255 // maxval).astype(np.uint8))


def test_palette_resolves_colormap():
    w, h = 4, 2
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    lut = np.zeros((3, 256), dtype=np.uint16)
    lut[:, :4] = np.array([[0, 65535, 257, 1000], [10, 20, 30, 40], [5, 6, 7, 8]])
    entries = _gray_entries(w, h, 8, 3, extra=[(320, 3, lut.astype("<u2").tobytes())])
    blob = _build_tiff(entries, [idx.tobytes()])
    got = decode_tiff_pixels(blob)
    assert got.dtype == np.uint16 and got.shape == (2, 4, 3)
    np.testing.assert_array_equal(got, lut.T[idx.astype(np.int32)])


def test_tiled_rgb_deflate():
    import zlib

    w, h, tw, th = 12, 10, 8, 8
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    tiles = []
    for r0 in range(0, h, th):
        for c0 in range(0, w, tw):
            tile = np.zeros((th, tw, 3), dtype=np.uint8)
            block = px[r0 : r0 + th, c0 : c0 + tw]
            tile[: block.shape[0], : block.shape[1]] = block
            tiles.append(zlib.compress(tile.tobytes()))
    entries = [
        (256, 3, w),
        (257, 3, h),
        (258, 3, (8, 8, 8)),
        (259, 3, 8),
        (262, 3, 2),
        (277, 3, 3),
        (322, 3, tw),
        (323, 3, th),
    ]
    blob = _build_tiff(entries, tiles, chunk_tags=(324, 325))
    np.testing.assert_array_equal(decode_tiff_pixels(blob), px)


def test_multi_ifd_decodes_first_image():
    px = np.full((2, 2), 7, dtype=np.uint8)
    blob = bytearray(_build_tiff(_gray_entries(2, 2, 8, 1), [px.tobytes()]))
    # chain a second IFD: patch the next-IFD pointer to a copy appended
    # at the end (its internal offsets are stale, but the FIRST image
    # must still decode — multi-IFD files only need IFD0 here)
    n = struct.unpack_from("<H", blob, 8)[0]
    next_ptr = 8 + 2 + n * 12
    second = len(blob)
    blob += blob[8 : 8 + 2 + n * 12 + 4]
    struct.pack_into("<I", blob, next_ptr, second)
    got = decode_tiff_pixels(bytes(blob))
    np.testing.assert_array_equal(got[:, :, 0], px)


# ------------------------------------------------------------ dispatch/edge


def test_is_tiff_rejects_lookalikes():
    assert not is_tiff(b"II am not a tiff at all, just text")
    assert not is_tiff(b"II*\x00")  # truncated
    assert not is_tiff(b"MM\x00\x2a\xff\xff\xff\xff")  # IFD past EOF
    assert is_tiff(encode_tiff(np.zeros((2, 2), dtype=np.uint8)))


def test_decode_image_stage_routes_tiff():
    px = np.arange(64, dtype=np.uint8).reshape(4, 16) * 3
    blob = encode_tiff(px, compression=5, predictor=2)
    batch = pa.table({"payload": pa.array([blob], pa.binary())})
    out = DecodeImage(strict=True)(batch)
    assert out.column("width").to_pylist() == [16]
    assert out.column("height").to_pylist() == [4]
    assert out.column("mean_luma").to_pylist()[0] == pytest.approx(float(px.mean()))


def test_decode_image_strict_raises_on_float_tiff():
    # sample format 3 (IEEE float) is out of scope -> strict raise
    entries = _gray_entries(2, 2, 8, 1, extra=[(339, 3, 3)])
    blob = _build_tiff(entries, [b"\0\0\0\0"])
    batch = pa.table({"payload": pa.array([blob], pa.binary())})
    with pytest.raises(NotImplementedError):
        DecodeImage(strict=True)(batch)
    out = DecodeImage(strict=False)(batch)  # non-strict: deterministic stub
    assert out.column("width").to_pylist()[0] >= 1

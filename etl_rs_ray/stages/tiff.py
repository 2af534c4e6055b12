"""TIFF codec — numpy + stdlib only, no libtiff/Pillow.

Decoder scope: baseline TIFF 6.0 plus the common extensions a data
lake actually sees — both byte orders (II/MM), strip AND tile
organisation, compressions 1 (none), 5 (LZW, MSB-first codes with the
TIFF early-change rule), 8/32946 (zlib/Deflate), 32773 (PackBits),
horizontal differencing predictor (tag 317 = 2), photometric 0/1
(grayscale, either polarity), 2 (RGB, extra samples ignored for luma),
3 (palette via the 16-bit ColorMap), bit depths 1/2/4/8/16, and both
planar configurations. Multi-IFD files decode their FIRST image (the
convention every thumbnail-carrying camera file relies on). JPEG-in-
TIFF, CCITT fax, floating-point samples raise ValueError — they route
to the strict/stub fallback in DecodeImage.

TIFF LZW is NOT the GIF LZW already in multimodal.py: codes are packed
most-significant-bit first, the code width bumps one entry EARLY
(when the next table slot is 2**w - 1, not 2**w), and Clear/EOI are
fixed at 256/257 for an 8-bit alphabet. Both quirks are exercised by
the roundtrip + cross-compression tests in tests/test_tiff_codec.py;
the real-world conformance fixture is the OS-shipped python.tiff
(uncompressed 16x16 RGBA, written by a third-party encoder).

The reference treats image payloads as opaque binary columns
(lib-etl has no image codecs); this decoder backs the DecodeImage
actor stage so the Ray-side plumbing is exercised with real pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# type id -> (struct code, size in bytes); rationals handled separately
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def is_tiff(payload: bytes) -> bool:
    """Header validation beyond the 2-byte order mark: magic 42 and an
    IFD offset that lands inside the payload on an even boundary."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        return False
    endian = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack(endian + "HI", payload[2:8])
    return magic == 42 and 8 <= ifd_off <= len(payload) - 2 and ifd_off % 2 == 0


def _read_ifd(payload: bytes, endian: str, ifd_off: int) -> dict:
    """First IFD -> {tag: list-of-values}. Out-of-line values are followed
    through their offset; rationals come back as floats."""
    (n,) = struct.unpack_from(endian + "H", payload, ifd_off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = ifd_off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(endian + "HHI", payload, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown type: per spec, skip the entry
        total = size * cnt
        if total <= 4:
            off = base + 8
        else:
            (off,) = struct.unpack_from(endian + "I", payload, base + 8)
        if off + total > len(payload):
            raise ValueError("TIFF IFD entry points past end of file")
        if typ in (5, 10):  # RATIONAL: pairs of (numerator, denominator)
            code = "I" if typ == 5 else "i"
            raw = struct.unpack_from(endian + code * (2 * cnt), payload, off)
            vals = [raw[2 * k] / raw[2 * k + 1] if raw[2 * k + 1] else 0.0 for k in range(cnt)]
        elif typ == 2:  # ASCII
            vals = [payload[off : off + cnt].split(b"\0")[0].decode("latin-1")]
        elif typ == 7:  # UNDEFINED: raw bytes
            vals = [payload[off : off + cnt]]
        else:
            vals = list(struct.unpack_from(endian + _TYPE_FMT[typ] * cnt, payload, off))
        tags[tag] = vals
    return tags


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (spec §13): MSB-first bit packing, 8-bit alphabet,
    Clear=256, EOI=257, and the 'early change' — the code width grows when
    the NEXT entry would hit 2**w - 1 (one code earlier than GIF)."""
    out = bytearray()
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    pos = 0
    nbits = len(bits)

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while pos + width <= nbits and len(out) < expected:
        code = 0
        for b in bits[pos : pos + width]:
            code = (code << 1) | int(b)
        pos += width
        if code == 256:
            reset()
            continue
        if code == 257:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out.extend(entry)
        prev = entry
        # early change, decoder side: the decoder's table lags the
        # encoder's by one entry (the first code after Clear adds
        # nothing), so it must widen at 2**w - 2 entries to read the
        # encoder's first (2**w - 1)-era code at the wider width —
        # libtiff's `maxcode = MAXCODE(nbits) - 1` rule
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    """TIFF LZW encoder (roundtrip tests): mirrors the early-change rule."""
    out_bits: list[int] = []

    def emit(code: int, width: int):
        for i in range(width - 1, -1, -1):
            out_bits.append((code >> i) & 1)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # spec: streams begin with a Clear code
    run = b""
    for byte in data:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # after writing entry next_code-1, the DECODER bumps when the next
        # slot == 2**w - 1; the encoder must bump at the same instant
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: clear, as real writers do
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([byte])
    if run:
        emit(table[run], width)
    emit(257, width)
    pad = (-len(out_bits)) % 8
    out_bits.extend([0] * pad)
    return np.packbits(np.array(out_bits, dtype=np.uint8)).tobytes()


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1 bytes
            out.extend(data[i : i + n + 1])
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out.extend(data[i : i + 1] * (257 - n))
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: replicate runs >=3, literals otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        if j - i >= 2:  # replicate run
            out.append(257 - (j - i + 1))
            out.append(data[i])
            i = j + 1
            continue
        # literal run: until the next >=3 replicate or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out.extend(data[i:j])
        i = j
    return bytes(out)


def _decompress(data: bytes, compression: int, expected: int) -> bytes:
    if compression == 1:
        return data[:expected]
    if compression == 5:
        return _lzw_decode(data, expected)
    if compression in (8, 32946):
        return zlib.decompress(data)[:expected]
    if compression == 32773:
        return _packbits_decode(data, expected)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _unpack_bits_row(row: bytes, bits: int, width: int) -> "np.ndarray":
    """Sub-byte samples (1/2/4-bit) -> uint8 array of raw sample values,
    high bits first within each byte (TIFF FillOrder 1)."""
    arr = np.unpackbits(np.frombuffer(row, dtype=np.uint8))
    arr = arr[: width * bits].reshape(width, bits)
    weights = 1 << np.arange(bits - 1, -1, -1)
    return (arr * weights).sum(axis=1).astype(np.uint8)


def decode_tiff_pixels(payload: bytes) -> "np.ndarray":
    """First IFD -> HxWxC uint8/uint16 pixel array (C=1 gray, 3 RGB).

    Palette images resolve through the ColorMap to 16-bit RGB;
    WhiteIsZero grayscale is inverted to the universal black-is-zero
    convention so downstream luma is polarity-independent.
    """
    if not is_tiff(payload):
        raise ValueError("not a TIFF stream")
    endian = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    t = _read_ifd(payload, endian, ifd_off)

    def one(tag: int, default=None):
        v = t.get(tag)
        return v[0] if v else default

    w, h = int(one(256, 0)), int(one(257, 0))
    if not (0 < w <= 65536 and 0 < h <= 65536):
        raise ValueError("bad TIFF dimensions")
    spp = int(one(277, 1))
    bits_list = [int(b) for b in t.get(258, [1])]
    if len(bits_list) < spp:
        bits_list = bits_list * spp
    bits = bits_list[0]
    if any(b != bits for b in bits_list[:spp]):
        raise ValueError("heterogeneous bits-per-sample unsupported")
    if bits not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported bit depth {bits}")
    compression = int(one(259, 1))
    photometric = int(one(262, 1))
    planar = int(one(284, 1))
    predictor = int(one(317, 1))
    sample_format = int(one(339, 1))
    if sample_format not in (1, 4):  # unsigned int (4 = undefined, treat as uint)
        raise ValueError("non-uint TIFF sample format unsupported")
    if photometric in (2, 3) and bits == 1:
        raise ValueError("1-bit color TIFF unsupported")

    dtype = np.uint16 if bits == 16 else np.uint8
    n_planes = spp if planar == 2 else 1
    chans_per_chunk = 1 if planar == 2 else spp

    # ---- gather (chunk_bytes, rows_in_chunk, plane, first_row) ----
    chunks: list[tuple[bytes, int, int, int, int]] = []  # + cols/first_col via tiles
    tile_w = one(322)
    if tile_w is not None:  # tiled organisation
        tile_w, tile_h = int(tile_w), int(one(323, 0))
        offs, cnts = t.get(324, []), t.get(325, [])
        tiles_across = (w + tile_w - 1) // tile_w
        tiles_down = (h + tile_h - 1) // tile_h
        per_plane = tiles_across * tiles_down
        if len(offs) < per_plane * n_planes or len(cnts) < len(offs):
            raise ValueError("TIFF tile tables truncated")
        out = np.zeros((n_planes, h, w, chans_per_chunk), dtype=dtype)
        row_bytes = (tile_w * chans_per_chunk * bits + 7) // 8
        for p in range(n_planes):
            for ti in range(per_plane):
                idx = p * per_plane + ti
                raw = payload[int(offs[idx]) : int(offs[idx]) + int(cnts[idx])]
                data = _decompress(raw, compression, row_bytes * tile_h)
                tile = _rows_to_samples(
                    data, tile_h, tile_w, chans_per_chunk, bits, endian, predictor
                )
                r0 = (ti // tiles_across) * tile_h
                c0 = (ti % tiles_across) * tile_w
                rr, cc = min(tile_h, h - r0), min(tile_w, w - c0)
                out[p, r0 : r0 + rr, c0 : c0 + cc] = tile[:rr, :cc]
        samples = out
    else:  # strips
        rows_per_strip = int(one(278, h)) or h
        offs, cnts = t.get(273, []), t.get(279, [])
        strips_per_plane = (h + rows_per_strip - 1) // rows_per_strip
        if len(offs) < strips_per_plane * n_planes:
            raise ValueError("TIFF strip tables truncated")
        if len(cnts) < len(offs):  # tolerate missing byte counts for comp=1
            if compression != 1:
                raise ValueError("TIFF strip byte counts missing")
            cnts = [len(payload)] * len(offs)
        out = np.zeros((n_planes, h, w, chans_per_chunk), dtype=dtype)
        row_bytes = (w * chans_per_chunk * bits + 7) // 8
        for p in range(n_planes):
            for si in range(strips_per_plane):
                idx = p * strips_per_plane + si
                r0 = si * rows_per_strip
                rows = min(rows_per_strip, h - r0)
                raw = payload[int(offs[idx]) : int(offs[idx]) + int(cnts[idx])]
                data = _decompress(raw, compression, row_bytes * rows)
                out[p, r0 : r0 + rows] = _rows_to_samples(
                    data, rows, w, chans_per_chunk, bits, endian, predictor
                )
        samples = out

    if planar == 2:  # (spp, h, w, 1) -> (h, w, spp)
        px = np.moveaxis(samples[:, :, :, 0], 0, -1)
    else:
        px = samples[0]

    maxval = (1 << bits) - 1
    if photometric == 3:  # palette -> 16-bit RGB via ColorMap
        cmap = t.get(320)
        if not cmap or len(cmap) < 3 * (maxval + 1):
            raise ValueError("TIFF palette missing/short ColorMap")
        lut = np.array(cmap[: 3 * (maxval + 1)], dtype=np.uint16).reshape(3, maxval + 1)
        return lut.T[px[:, :, 0].astype(np.int32)]  # (h, w, 3) uint16
    if photometric == 0:  # WhiteIsZero -> invert
        px = (maxval - px.astype(np.int32)).astype(dtype)
    if photometric in (0, 1):
        if bits in (1, 2, 4):  # scale sub-byte gray to full 8-bit range
            px = (px.astype(np.int32) * 255 // maxval).astype(np.uint8)
        return px[:, :, :1]
    if photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples")
        return px[:, :, :3]  # extra samples (alpha) dropped for luma
    raise ValueError(f"unsupported TIFF photometric {photometric}")


def _rows_to_samples(
    data: bytes,
    rows: int,
    width: int,
    chans: int,
    bits: int,
    endian: str,
    predictor: int,
) -> "np.ndarray":
    """Decompressed chunk bytes -> (rows, width, chans) sample array in
    NATIVE byte order, applying horizontal differencing if predictor == 2."""
    dtype = np.uint16 if bits == 16 else np.uint8
    row_bytes = (width * chans * bits + 7) // 8
    if len(data) < row_bytes * rows:
        raise ValueError("TIFF chunk shorter than declared rows")
    if bits == 8:
        arr = np.frombuffer(data, dtype=np.uint8, count=rows * row_bytes)
        arr = arr.reshape(rows, row_bytes)[:, : width * chans]
    elif bits == 16:
        # sample byte order follows the file header order mark
        arr = np.frombuffer(data, dtype=np.dtype(endian + "u2"), count=rows * row_bytes // 2)
        arr = arr.reshape(rows, row_bytes // 2)[:, : width * chans].astype(np.uint16)
    else:
        out = np.empty((rows, width * chans), dtype=np.uint8)
        for r in range(rows):
            out[r] = _unpack_bits_row(data[r * row_bytes : (r + 1) * row_bytes], bits, width * chans)
        arr = out
    arr = arr.reshape(rows, width, chans)
    if predictor == 2:
        if bits not in (8, 16):
            raise ValueError("TIFF predictor on sub-byte samples unsupported")
        arr = np.cumsum(arr.astype(np.uint32), axis=1, dtype=np.uint32)
        arr = (arr & ((1 << bits) - 1)).astype(dtype)
    return arr


def decode_tiff(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma) — the DecodeImage contract. 16-bit and
    palette pixels are normalised to the 0..255 scale before BT.601."""
    px = decode_tiff_pixels(payload)
    h, w = px.shape[:2]
    f = px.astype(np.float64)
    if px.dtype == np.uint16:
        f = f / 257.0  # 65535 -> 255
    if f.shape[2] == 1:
        luma = float(f.mean())
    else:
        luma = float((0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]).mean())
    return w, h, luma


def encode_tiff(
    pixels: "np.ndarray",
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    planar: int = 1,
) -> bytes:
    """Minimal stripped TIFF writer for roundtrip tests: 8-bit gray (HxW
    or HxWx1) or RGB (HxWx3), compressions 1/5/8/32773, optional
    horizontal-differencing predictor and planar=2 layout."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    assert pixels.dtype == np.uint8 and c in (1, 3)
    endian = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or h

    def compress(chunk: "np.ndarray") -> bytes:
        if predictor == 2:
            d = chunk.astype(np.int16)
            d[:, 1:] = d[:, 1:] - d[:, :-1]
            chunk = (d & 0xFF).astype(np.uint8)
        raw = chunk.tobytes()
        if compression == 1:
            return raw
        if compression == 5:
            return _lzw_encode(raw)
        if compression == 8:
            return zlib.compress(raw)
        if compression == 32773:
            return _packbits_encode(raw)
        raise ValueError(compression)

    strips: list[bytes] = []
    planes = [pixels[:, :, i : i + 1] for i in range(c)] if planar == 2 else [pixels]
    for plane in planes:
        for r0 in range(0, h, rows_per_strip):
            strips.append(compress(plane[r0 : r0 + rows_per_strip]))

    n_entries = 11 + (1 if predictor == 2 else 0) + (1 if planar == 2 else 0)
    header = struct.pack(endian + "2sHI", b"MM" if big_endian else b"II", 42, 8)
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    # out-of-line arrays: bits (if c==3), strip offsets, strip counts
    pre: list[bytes] = []

    def outline(b: bytes) -> int:
        nonlocal data_off
        off = data_off
        pre.append(b)
        data_off += len(b) + (len(b) & 1)
        return off

    bits_val = 8 if c == 1 else outline(struct.pack(endian + "HHH", 8, 8, 8))
    n_strips = len(strips)
    if n_strips == 1:
        strip_off_val = None  # patched below
        strip_cnt_val = len(strips[0])
    else:
        strip_cnt_val = outline(struct.pack(endian + "I" * n_strips, *[len(s) for s in strips]))
        strip_off_val = outline(b"\0" * 4 * n_strips)  # placeholder, patched

    strip_data_off = data_off
    offsets = []
    for s in strips:
        offsets.append(data_off)
        data_off += len(s) + (len(s) & 1)

    def entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        if typ == 3 and cnt == 1:
            # a SHORT value sits in the FIRST two bytes of the value field
            return struct.pack(endian + "HHIHH", tag, typ, cnt, val, 0)
        return struct.pack(endian + "HHII", tag, typ, cnt, val)

    entries = [
        entry(256, 3, 1, w),
        entry(257, 3, 1, h),
        entry(258, 3, c, bits_val),
        entry(259, 3, 1, compression),
        entry(262, 3, 1, 1 if c == 1 else 2),
        entry(273, 4, n_strips, offsets[0] if n_strips == 1 else strip_off_val),
        entry(277, 3, 1, c),
        entry(278, 3, 1, rows_per_strip),
        entry(279, 4, n_strips, strip_cnt_val if n_strips > 1 else len(strips[0])),
        entry(282, 3, 1, 72),  # XResolution as SHORT is nonstandard but read as value
        entry(283, 3, 1, 72),
    ]
    if predictor == 2:
        entries.append(entry(317, 3, 1, 2))
    if planar == 2:
        entries.append(entry(284, 3, 1, 2))
    entries.sort(key=lambda e: struct.unpack(endian + "H", e[:2])[0])

    out = bytearray(header)
    out += struct.pack(endian + "H", n_entries)
    for e in entries:
        out += e
    out += struct.pack(endian + "I", 0)  # next IFD
    for b in pre:
        out += b + (b"\0" if len(b) & 1 else b"")
    assert len(out) == strip_data_off
    for s in strips:
        out += s + (b"\0" if len(s) & 1 else b"")
    if n_strips > 1:
        out[strip_off_val : strip_off_val + 4 * n_strips] = struct.pack(
            endian + "I" * n_strips, *offsets
        )
    return bytes(out)

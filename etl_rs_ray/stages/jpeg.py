"""JPEG codec — numpy + stdlib only, no libjpeg/Pillow.

Decoder scope: sequential baseline (SOF0/SOF1) AND progressive (SOF2)
DCT, 8-bit, grayscale or YCbCr, arbitrary 1-2 h/v sampling factors
(4:4:4, 4:2:2, 4:2:0), restart intervals (DRI/RSTn), multi-table
DQT/DHT markers, APPn/COM skipped. Progressive streams apply every
scan in order: spectral selection + successive approximation per
T.81 §G — DC first/refinement, AC first/refinement with EOB-run
coding. Lossless/hierarchical/arithmetic frames and 12-bit precision
raise ValueError — they route to the strict/stub fallback in
DecodeImage.

The decoder trusts nothing baked-in: Huffman and quantization tables are
read from the stream's own DHT/DQT markers, so conformance is checked
against real third-party encoder output (the OS ships several libjpeg
streams; see tests/test_jpeg_codec.py). The encoder exists for
roundtrip tests and uses the ITU T.81 Annex K example tables — any
valid prefix code works, since the decoder reads whatever DHT declares.

The per-symbol Huffman loop is Python (acceptable for the actor-pool
metadata stage this feeds); everything after entropy decode — dequant,
dezigzag, IDCT, upsample, color transform — is vectorized numpy over
all blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np


def _zigzag_order() -> "np.ndarray":
    """Natural (row-major) index of each zigzag position, generated from
    the diagonal-walk definition rather than a memorized table."""
    zz = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in rng if s % 2 else reversed(rng):
            zz.append(r * 8 + (s - r))
    return np.array(zz, dtype=np.int64)


ZIGZAG = _zigzag_order()


def _idct_matrix() -> "np.ndarray":
    """A[u, x] = a(u) cos((2x+1) u pi / 16): spatial = A.T @ F @ A."""
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = np.full((8, 1), np.sqrt(2.0 / 8.0))
    a[0, 0] = np.sqrt(1.0 / 8.0)
    return a * np.cos((2 * x + 1) * u * np.pi / 16.0)


_A = _idct_matrix()


def idct_blocks(coefs: "np.ndarray") -> "np.ndarray":
    """2-D type-III DCT of (n, 8, 8) coefficient blocks, vectorized."""
    return np.einsum("ux,nuv,vy->nxy", _A, coefs, _A, optimize=True)


def fdct_blocks(pixels: "np.ndarray") -> "np.ndarray":
    """2-D type-II DCT of (n, 8, 8) spatial blocks (encoder side)."""
    return np.einsum("ux,nxy,vy->nuv", _A, pixels, _A, optimize=True)


# --- decoder -------------------------------------------------------------------


class _BitReader:
    __slots__ = ("d", "i", "b")

    def __init__(self, d: bytes):
        self.d = d
        self.i = 0
        self.b = 0

    def read_bit(self) -> int:
        if self.i >= len(self.d):
            raise ValueError("JPEG entropy stream truncated")
        bit = (self.d[self.i] >> (7 - self.b)) & 1
        self.b += 1
        if self.b == 8:
            self.b = 0
            self.i += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _build_huffman(counts: list[int], symbols: list[int]) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    lut = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            lut[(ln, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    if k != len(symbols):
        raise ValueError("JPEG Huffman table count/symbol mismatch")
    return lut


def _decode_symbol(br: _BitReader, lut: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lut.get((ln, code), -1)
        if sym >= 0:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n magnitude bits to a signed value."""
    return v - (1 << n) + 1 if v < (1 << (n - 1)) else v


def _entropy_segments(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Unstuff (FF00 -> FF) and split one scan's entropy data on RSTn
    markers; each returned segment decodes with fresh DC predictors and
    bit alignment. Returns (segments, offset of the scan-terminating
    marker) — progressive streams have many scans, each ended by the
    next DHT/SOS/EOI marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        c = data[i]
        if c != 0xFF:
            cur.append(c)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:
            i += 1  # fill byte
        else:
            break  # next real marker ends this scan
    segs.append(bytes(cur))
    return segs, i


def _decode_block(
    br: _BitReader, dc_lut: dict, ac_lut: dict, pred: int
) -> tuple["np.ndarray", int]:
    """One 8x8 block's coefficients in ZIGZAG order; returns (coefs, dc)."""
    coefs = np.zeros(64, dtype=np.int32)
    t = _decode_symbol(br, dc_lut)
    diff = _extend(br.read_bits(t), t) if t else 0
    dc = pred + diff
    coefs[0] = dc
    k = 1
    while k < 64:
        rs = _decode_symbol(br, ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL: sixteen zeros
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC run overruns block")
        coefs[k] = _extend(br.read_bits(s), s)
        k += 1
    return coefs, dc


def decode_jpeg_pixels(payload: bytes) -> "np.ndarray":
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG into (h, w, 1)
    grayscale or (h, w, 3) RGB uint8 pixels. Progressive streams apply
    every scan in order — spectral selection and successive
    approximation per T.81 §G (DC/AC first + refinement passes,
    EOB-run coding)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> lut
    frame = None
    blocks: dict[int, np.ndarray] = {}
    dri = 0
    saw_scan = False
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        m = payload[i + 1]
        if m == 0xFF:
            i += 1
            continue
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:
            break
        if i + 4 > n:
            raise ValueError("truncated JPEG marker")
        ln = struct.unpack_from(">H", payload, i + 2)[0]
        seg = payload[i + 4 : i + 2 + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    qt[tq] = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                total = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + total])
                huff[(tc, th)] = _build_huffman(counts, symbols)
                p += 17 + total
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0 / SOF1 (ext. sequential) / SOF2
            prec = seg[0]
            h = struct.unpack_from(">H", seg, 1)[0]
            w = struct.unpack_from(">H", seg, 3)[0]
            nc = seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if not all(
                c["h"] in (1, 2, 4)
                and c["v"] in (1, 2, 4)
                and hmax % c["h"] == 0
                and vmax % c["v"] == 0
                for c in comps
            ):
                raise ValueError("unsupported JPEG sampling factors")
            frame = {
                "w": w,
                "h": h,
                "comps": comps,
                "hmax": hmax,
                "vmax": vmax,
                "mcux": -(-w // (8 * hmax)),
                "mcuy": -(-h // (8 * vmax)),
                "progressive": m == 0xC2,
            }
            blocks = {
                c["id"]: np.zeros(
                    (frame["mcuy"] * c["v"], frame["mcux"] * c["h"], 64), dtype=np.int32
                )
                for c in comps
            }
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0x{m:02x}")
        elif m == 0xDD:  # DRI
            dri = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cid, tt >> 4, tt & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, i = _entropy_segments(payload, i + 2 + ln)
            if frame["progressive"]:
                _apply_progressive_scan(
                    frame, blocks, scan_comps, ss, se, ah, al, segs, huff, dri
                )
            else:
                if ns != len(frame["comps"]):
                    raise ValueError("non-interleaved multi-scan sequential JPEG unsupported")
                _apply_baseline_scan(frame, blocks, scan_comps, segs, huff, dri)
            saw_scan = True
            continue  # i already points at the scan-terminating marker
        # APPn / COM / others: skip
        i += 2 + ln
    if frame is None or not saw_scan:
        raise ValueError("JPEG has no scan")
    return _finalize(frame, blocks, qt)


def _apply_baseline_scan(frame, blocks, scan_comps, segs, huff, dri):
    comps = {c["id"]: c for c in frame["comps"]}
    mcux, mcuy = frame["mcux"], frame["mcuy"]
    preds = {cid: 0 for cid, _, _ in scan_comps}
    seg_idx = 0
    br = _BitReader(segs[0])
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG restart interval underrun")
            br = _BitReader(segs[seg_idx])
            preds = {cid: 0 for cid, _, _ in scan_comps}
        my, mx = divmod(m, mcux)
        for cid, td, ta in scan_comps:
            c = comps[cid]
            for vy in range(c["v"]):
                for hx in range(c["h"]):
                    coefs, preds[cid] = _decode_block(
                        br, huff[(0, td)], huff[(1, ta)], preds[cid]
                    )
                    blocks[cid][my * c["v"] + vy, mx * c["h"] + hx] = coefs


def _scan_units(frame, scan_comps):
    """Iteration geometry for one progressive scan: interleaved scans
    walk MCUs; single-component scans walk that component's own block
    grid (T.81 §G: AC scans are always single-component)."""
    comps = {c["id"]: c for c in frame["comps"]}
    if len(scan_comps) > 1:
        units = []
        for my in range(frame["mcuy"]):
            for mx in range(frame["mcux"]):
                mcu = []
                for cid, td, ta in scan_comps:
                    c = comps[cid]
                    for vy in range(c["v"]):
                        for hx in range(c["h"]):
                            mcu.append((cid, my * c["v"] + vy, mx * c["h"] + hx, td, ta))
                units.append(mcu)
        return units
    cid, td, ta = scan_comps[0]
    c = comps[cid]
    cw = -(-frame["w"] * c["h"] // frame["hmax"])
    ch = -(-frame["h"] * c["v"] // frame["vmax"])
    bw, bh = -(-cw // 8), -(-ch // 8)
    return [[(cid, by, bx, td, ta)] for by in range(bh) for bx in range(bw)]


def _apply_progressive_scan(frame, blocks, scan_comps, ss, se, ah, al, segs, huff, dri):
    units = _scan_units(frame, scan_comps)
    preds = {cid: 0 for cid, _, _ in scan_comps}
    seg_idx = 0
    br = _BitReader(segs[0])
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    for m, unit in enumerate(units):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG restart interval underrun")
            br = _BitReader(segs[seg_idx])
            preds = {cid: 0 for cid, _, _ in scan_comps}
            eobrun = 0
        for cid, by, bx, td, ta in unit:
            coef = blocks[cid][by, bx]
            if ss == 0:  # DC scan (se must be 0)
                if ah == 0:  # first pass
                    t = _decode_symbol(br, huff[(0, td)])
                    diff = _extend(br.read_bits(t), t) if t else 0
                    preds[cid] += diff
                    coef[0] = preds[cid] << al
                else:  # refinement: one bit per block
                    if br.read_bit():
                        coef[0] |= p1
                continue
            # AC scan (single component per spec)
            ac_lut = huff[(1, ta)]
            if ah == 0:  # first pass for this band
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_symbol(br, ac_lut)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run overruns band")
                    coef[ZIGZAG[k]] = _extend(br.read_bits(s), s) << al
                    k += 1
            else:  # refinement pass (T.81 G.1.2.3 / jdphuff structure)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _decode_symbol(br, ac_lut)
                        r, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.read_bits(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            val = p1 if br.read_bit() else m1
                        while k <= se:
                            z = ZIGZAG[k]
                            if coef[z] != 0:
                                if br.read_bit() and (coef[z] & p1) == 0:
                                    coef[z] += p1 if coef[z] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            coef[ZIGZAG[k]] = val
                        k += 1
                if eobrun > 0:
                    # refine the remaining nonzero-history coefficients
                    while k <= se:
                        z = ZIGZAG[k]
                        if coef[z] != 0 and br.read_bit() and (coef[z] & p1) == 0:
                            coef[z] += p1 if coef[z] >= 0 else m1
                        k += 1
                    eobrun -= 1


def _finalize(frame, blocks, qt):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    planes = []
    for c in comps:
        # progressive scans store coefficients in NATURAL positions
        # already (via ZIGZAG[k]); baseline fills zigzag order. Both
        # paths store zigzag-ordered vectors here: baseline writes the
        # raw zigzag vector, progressive writes into natural slots of a
        # 64-vector that _finalize must NOT re-map. Unify by having
        # baseline store zigzag and progressive store natural, tagged:
        zz = blocks[c["id"]].reshape(-1, 64)
        if frame["progressive"]:
            nat = zz * qt[c["tq"]][ZIGZAG.argsort()][None, :]
        else:
            dq = zz * qt[c["tq"]][None, :]
            nat = np.zeros_like(dq)
            nat[:, ZIGZAG] = dq
        spatial = idct_blocks(nat.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        by, bx = blocks[c["id"]].shape[:2]
        plane = spatial.reshape(by, bx, 8, 8).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[..., None]
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(planes)}")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean luma): BT.601 from the decoded RGB pixels,
    plain mean for grayscale."""
    px = decode_jpeg_pixels(payload)
    h, w = px.shape[:2]
    arr = px.astype(np.float64)
    if px.shape[2] == 1:
        return w, h, float(arr[..., 0].mean())
    luma = 0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
    return w, h, float(luma.mean())


def is_jpeg(payload: bytes) -> bool:
    """True iff the payload fully decodes as a baseline or progressive
    JPEG — same stance as is_png/is_gif: corrupt or unsupported streams
    route to the strict/stub fallback, never to a decode crash."""
    if payload[:2] != b"\xff\xd8":
        return False
    try:
        decode_jpeg_pixels(payload)
        return True
    except (ValueError, IndexError, KeyError, struct.error):
        return False


# --- encoder (tests only: ITU T.81 Annex K example tables) --------------------

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

_DC_LUMA_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_SYMS = list(range(12))
_DC_CHROMA_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_SYMS = list(range(12))
_AC_LUMA_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_CHROMA_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_SYMS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            b = ((self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n = 0
            self.acc = 0


def _code_table(counts, symbols):
    """symbol -> (code, length) for the encoder."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            table[symbols[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _mag_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _encode_block(bw, coefs_zz, dc_tbl, ac_tbl, pred):
    dc = int(coefs_zz[0])
    diff = dc - pred
    cat = _category(diff)
    bw.write(*dc_tbl[cat])
    if cat:
        bw.write(_mag_bits(diff, cat), cat)
    run = 0
    last_nz = int(np.max(np.nonzero(coefs_zz)[0])) if np.any(coefs_zz[1:]) else 0
    for k in range(1, 64):
        v = int(coefs_zz[k])
        if k > last_nz:
            bw.write(*ac_tbl[0x00])  # EOB
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_tbl[0xF0])  # ZRL
            run -= 16
        cat = _category(v)
        bw.write(*ac_tbl[(run << 4) | cat])
        bw.write(_mag_bits(v, cat), cat)
        run = 0
    return dc


def _scale_q(base: "np.ndarray", quality: int) -> "np.ndarray":
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _plane_blocks(plane: "np.ndarray", q_zz: "np.ndarray") -> "np.ndarray":
    """(h, w) float plane -> (by*bx, 64) quantized zigzag coefficients."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coefs = fdct_blocks(blocks - 128.0)
    zz = coefs.reshape(-1, 64)[:, ZIGZAG]
    return np.round(zz / q_zz[None, :]).astype(np.int32), by, bx


def encode_jpeg(
    pixels: "np.ndarray",
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encoder for tests: (h, w) or (h, w, 1) grayscale, or
    (h, w, 3) RGB; ``subsample=True`` emits 4:2:0, else 4:4:4;
    ``restart_interval`` inserts RSTn markers every that-many MCUs."""
    pixels = np.asarray(pixels, dtype=np.float64)
    gray = pixels.ndim == 2 or pixels.shape[2] == 1
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[..., 0]
    h, w = pixels.shape[:2]
    ql = _scale_q(_Q_LUMA, quality)[ZIGZAG]  # store in zigzag order
    qc = _scale_q(_Q_CHROMA, quality)[ZIGZAG]
    if gray:
        planes = [pixels]
        samp = [(1, 1)]
        qids = [0]
    else:
        r, g, b = pixels[..., 0], pixels[..., 1], pixels[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad odd dims by edge replication, then 2x2 box mean
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cb = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            cr = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component quantized zigzag blocks, grid-aligned to the MCU tiling
    comp_blocks = []
    for plane, (hs, vs), qid in zip(planes, samp, qids):
        need_h, need_w = mcuy * vs * 8, mcux * hs * 8
        ph, pw = plane.shape
        plane = np.pad(plane, ((0, need_h - ph), (0, need_w - pw)), mode="edge")
        zz, by, bx = _plane_blocks(plane, ql if qid == 0 else qc)
        comp_blocks.append(zz.reshape(by, bx, 64))

    dc_tbls = [_code_table(_DC_LUMA_COUNTS, _DC_LUMA_SYMS), _code_table(_DC_CHROMA_COUNTS, _DC_CHROMA_SYMS)]
    ac_tbls = [_code_table(_AC_LUMA_COUNTS, _AC_LUMA_SYMS), _code_table(_AC_CHROMA_COUNTS, _AC_CHROMA_SYMS)]
    tids = [0] + [1] * (len(planes) - 1)

    body = bytearray()
    bw = _BitWriter()
    preds = [0] * len(planes)
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            body += bw.out
            bw = _BitWriter()
            body += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            preds = [0] * len(planes)
        my, mx = divmod(m, mcux)
        for ci, (hs, vs) in enumerate(samp):
            for vy in range(vs):
                for hx in range(hs):
                    preds[ci] = _encode_block(
                        bw,
                        comp_blocks[ci][my * vs + vy, mx * hs + hx],
                        dc_tbls[tids[ci]],
                        ac_tbls[tids[ci]],
                        preds[ci],
                    )
    bw.flush()
    body += bw.out

    def seg(marker, data):
        return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + ql.astype(np.uint8).tobytes())
    if not gray:
        out += seg(0xDB, bytes([0x01]) + qc.astype(np.uint8).tobytes())
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([len(planes)])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, qids[ci]])
    out += seg(0xC0, bytes(sof))
    out += seg(0xC4, bytes([0x00] + _DC_LUMA_COUNTS) + bytes(_DC_LUMA_SYMS))
    out += seg(0xC4, bytes([0x10] + _AC_LUMA_COUNTS) + bytes(_AC_LUMA_SYMS))
    if not gray:
        out += seg(0xC4, bytes([0x01] + _DC_CHROMA_COUNTS) + bytes(_DC_CHROMA_SYMS))
        out += seg(0xC4, bytes([0x11] + _AC_CHROMA_COUNTS) + bytes(_AC_CHROMA_SYMS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (tids[ci] << 4) | tids[ci]])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, bytes(sos))
    out += body
    out += b"\xff\xd9"
    return bytes(out)

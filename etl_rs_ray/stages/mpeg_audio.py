"""MPEG audio (MP3) frame-level metadata — stdlib only, no decode libs.

Full Layer III sample reconstruction needs the normative spec tables
(the 512-coefficient synthesis window, 34 Huffman code tables) that
cannot be re-derived from a formula, so SAMPLE decode stays behind the
strict-mode NotImplementedError in DecodeAudio. What a data pipeline
actually needs from an opaque audio column, though — duration, bitrate,
sample rate, channel count, CBR/VBR — lives entirely in the fixed-size
frame HEADERS, which this module parses exactly:

- ID3v2 prefix skip (syncsafe size), ID3v1 trailer skip;
- every frame header walked with the layer/version-specific frame-size
  arithmetic (Layer I: 4*(12*bitrate/rate + pad); Layer II/III:
  (144 or 72)*bitrate*8/rate... expressed per ISO 11172-3 / 13818-3:
  samples_per_frame/8 * bitrate / rate + pad);
- Xing/Info and VBRI headers recognised in the first frame (VBR frame
  count cross-checked against the walk).

Because each frame's size is COMPUTED from its header and the next
frame must start on a sync word, a successful whole-file walk is a
strong structural validation against third-party encoder output
(tests/test_mpeg_audio.py walks the OS-shipped LAME stream).

The reference pipes audio bytes through untyped blobs (lib-etl has no
audio codecs); this backs the DecodeAudio actor stage's metadata path.
"""

from __future__ import annotations

import struct

# bitrate tables in kbps, index 1..14 (0 = free format, 15 = invalid)
_BITRATES = {
    # (version_group, layer): V1 = MPEG-1; V2 = MPEG-2 and 2.5 (LSF)
    ("V1", 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    ("V1", 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    ("V1", 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    ("V2", 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    ("V2", 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    ("V2", 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SAMPLE_RATES = {  # by version id bits (00=2.5, 10=2, 11=1)
    3: [44100, 48000, 32000],
    2: [22050, 24000, 16000],
    0: [11025, 12000, 8000],
}


def _parse_header(b: bytes):
    """4 header bytes -> (version_bits, layer, bitrate_kbps, sample_rate,
    padding, channels, samples_per_frame, frame_bytes) or None."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    version_bits = (b[1] >> 3) & 3  # 00=2.5, 01=reserved, 10=2, 11=1
    layer_bits = (b[1] >> 1) & 3  # 00=reserved, 01=III, 10=II, 11=I
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits  # 1, 2, 3
    bitrate_idx = (b[2] >> 4) & 0xF
    sr_idx = (b[2] >> 2) & 3
    if bitrate_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    vgroup = "V1" if version_bits == 3 else "V2"
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx]
    rate = _SAMPLE_RATES[version_bits][sr_idx]
    padding = (b[2] >> 1) & 1
    channels = 1 if ((b[3] >> 6) & 3) == 3 else 2
    if layer == 1:
        samples = 384
        frame_bytes = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        # Layer II: 1152 always; Layer III: 1152 MPEG-1, 576 LSF
        samples = 1152 if (layer == 2 or vgroup == "V1") else 576
        frame_bytes = samples // 8 * bitrate * 1000 // rate + padding
    return version_bits, layer, bitrate, rate, padding, channels, samples, frame_bytes


def _skip_id3(payload: bytes) -> tuple[int, int]:
    """(start, end) of the MPEG frame region after ID3v2/ID3v1 tags."""
    start = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
        footer = 10 if payload[5] & 0x10 else 0
        start = 10 + size + footer
    end = len(payload)
    if end - start >= 128 and payload[end - 128 : end - 125] == b"TAG":
        end -= 128
    return start, end


def is_mpeg_audio(payload: bytes) -> bool:
    """True only if TWO consecutive header-consistent frames chain from
    the first sync word — a lone 0xFFEx byte pair is not evidence."""
    start, end = _skip_id3(payload)
    h = _parse_header(payload[start : start + 4])
    if h is None:
        return False
    nxt = start + h[-1]
    if nxt == end:  # single-frame stream: accept (size arithmetic held)
        return True
    return nxt < end and _parse_header(payload[nxt : nxt + 4]) is not None


def _xing_offset(version_bits: int, channels: int) -> int:
    """Side-info size positions the Xing/Info tag inside the first frame."""
    if version_bits == 3:  # MPEG-1
        return 4 + (17 if channels == 1 else 32)
    return 4 + (9 if channels == 1 else 17)


def mpeg_audio_metadata(payload: bytes) -> dict:
    """Walk every frame; return exact stream metadata.

    Keys: version ('1'/'2'/'2.5'), layer, sample_rate, channels,
    frame_count, duration_s, bitrate_kbps (mean over frames), vbr
    (True when frame bitrates differ or a Xing VBR tag is present),
    xing_frames (tag value or None — cross-checkable vs frame_count).
    Raises ValueError on streams that are not walkable MPEG audio.
    """
    start, end = _skip_id3(payload)
    pos = start
    frame_count = 0
    bitrates: set[int] = set()
    bitrate_sum = 0
    meta = None
    xing_frames = None
    while pos + 4 <= end:
        h = _parse_header(payload[pos : pos + 4])
        if h is None:
            if frame_count == 0:
                raise ValueError("not an MPEG audio stream")
            break  # trailing garbage / truncated last frame: stop cleanly
        version_bits, layer, bitrate, rate, _pad, channels, samples, frame_bytes = h
        if meta is None:
            meta = (version_bits, layer, rate, channels, samples)
            xo = pos + _xing_offset(version_bits, channels)
            tag = payload[xo : xo + 4]
            if tag in (b"Xing", b"Info"):
                (flags,) = struct.unpack(">I", payload[xo + 4 : xo + 8])
                if flags & 1:
                    (xing_frames,) = struct.unpack(">I", payload[xo + 8 : xo + 12])
                if tag == b"Xing":
                    bitrates.add(-1)  # VBR marker
            elif payload[xo : xo + 4] == b"VBRI" or payload[pos + 36 : pos + 40] == b"VBRI":
                (xing_frames,) = struct.unpack(">I", payload[pos + 36 + 14 : pos + 36 + 18])
                bitrates.add(-1)
        elif (version_bits, layer, rate, channels, samples) != meta:
            break  # header parameters changed mid-stream: stop at the break
        bitrates.add(bitrate)
        bitrate_sum += bitrate
        frame_count += 1
        if frame_bytes <= 4:
            raise ValueError("degenerate MPEG frame size")
        pos += frame_bytes
    if frame_count == 0 or meta is None:
        raise ValueError("not an MPEG audio stream")
    version_bits, layer, rate, channels, samples = meta
    version = {3: "1", 2: "2", 0: "2.5"}[version_bits]
    return {
        "version": version,
        "layer": layer,
        "sample_rate": rate,
        "channels": channels,
        "frame_count": frame_count,
        "duration_s": frame_count * samples / rate,
        "bitrate_kbps": bitrate_sum / frame_count,
        "vbr": len(bitrates - {-1}) > 1 or -1 in bitrates,
        "xing_frames": xing_frames,
    }


def encode_cbr_stream(
    n_frames: int,
    version_bits: int = 3,
    layer: int = 3,
    bitrate_idx: int = 9,
    sr_idx: int = 0,
    mono: bool = False,
    pad_alternate: bool = False,
) -> bytes:
    """Synthesize a structurally valid CBR stream (headers + zero audio
    data) for walker tests; pad_alternate toggles the padding bit per
    frame the way 44.1 kHz real streams do."""
    out = bytearray()
    for i in range(n_frames):
        padding = (i & 1) if pad_alternate else 0
        b1 = 0xE0 | (version_bits << 3) | ((4 - layer) << 1) | 1
        b2 = (bitrate_idx << 4) | (sr_idx << 2) | (padding << 1)
        b3 = (0xC0 if mono else 0x00) | 0x04
        hdr = bytes([0xFF, b1, b2, b3])
        h = _parse_header(hdr)
        assert h is not None
        out += hdr + b"\0" * (h[-1] - 4)
    return bytes(out)

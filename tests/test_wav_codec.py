"""WAV decode beyond stdlib: integer PCM widths, IEEE float, and G.711
mu-law/A-law companded audio (stdlib ``wave`` accepts none of the
non-PCM formats). The expansion tables are validated against an
independent implementation of the COMPRESSION side transcribed from the
canonical reference (Sun g711.c segment search), plus the spec's known
anchor values (mu-law max 32124, A-law max 32256, A-law has no zero)."""

import struct

import numpy as np
import pytest

from etl_rs_ray.stages.multimodal import (
    _g711_alaw_table,
    _g711_mulaw_table,
    decode_wav,
    encode_wav,
)


def _wav(tag: int, bits: int, data: bytes, rate: int = 8000, ch: int = 1) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


# --- independent compression side (Sun g711.c linear2ulaw/linear2alaw) --------

_SEG_ENDS = [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF]


def _linear2ulaw(pcm: int) -> int:
    BIAS = 0x84
    mask = 0x7F if pcm < 0 else 0xFF
    if pcm < 0:
        pcm = -pcm
    pcm = min(pcm + BIAS, 0x7FFF)
    seg = next(i for i, e in enumerate(_SEG_ENDS) if pcm <= e)
    uval = (seg << 4) | ((pcm >> (seg + 3)) & 0xF)
    return uval ^ mask


def _linear2alaw(pcm: int) -> int:
    mask = 0xD5 if pcm >= 0 else 0x55
    if pcm < 0:
        pcm = -pcm - 1  # sic: reference uses -pcm-1 on two's complement
    pcm = min(pcm, 0x7FFF)
    seg = next(i for i, e in enumerate(_SEG_ENDS) if pcm <= e)
    if seg < 1:
        aval = pcm >> 4
    else:
        aval = (seg << 4) | ((pcm >> (seg + 3)) & 0xF)
    return aval ^ mask


def test_mulaw_table_anchors_and_roundtrip():
    t = _g711_mulaw_table()
    assert t[0xFF] == 0  # transmitted all-ones = zero
    assert t[0x80] == 32124  # canonical positive max
    assert t[0x00] == -32124  # canonical negative max
    # compress (independent impl) then expand: error bounded by the
    # segment's quantization step
    rng = np.random.default_rng(1)
    for pcm in list(rng.integers(-32000, 32000, 500)) + [0, 1, -1, 32124, -32124]:
        code = _linear2ulaw(int(pcm))
        back = int(t[code])
        seg = next(i for i, e in enumerate(_SEG_ENDS) if min(abs(int(pcm)) + 0x84, 0x7FFF) <= e)
        assert abs(back - int(pcm)) <= (1 << (seg + 3))


def test_alaw_table_anchors_and_roundtrip():
    t = _g711_alaw_table()
    assert t[0xAA] == 32256  # canonical positive max
    assert t[0x2A] == -32256
    assert (t != 0).all()  # A-law has no zero code
    assert t[0xD5] == 8  # smallest positive magnitude
    rng = np.random.default_rng(2)
    for pcm in list(rng.integers(-32000, 32000, 500)) + [0, 8, -8, 32256, -32256]:
        code = _linear2alaw(int(pcm))
        back = int(t[code])
        seg = next(i for i, e in enumerate(_SEG_ENDS) if min(abs(int(pcm)), 0x7FFF) <= e)
        assert abs(back - int(pcm)) <= (1 << (seg + 4))


def test_companded_wav_decodes():
    t = _g711_mulaw_table()
    rng = np.random.default_rng(3)
    lin = (rng.standard_normal(4000) * 8000).astype(int)
    codes = bytes(_linear2ulaw(int(v)) for v in lin)
    rate, dur, rms = decode_wav(_wav(7, 8, codes))
    assert rate == 8000 and dur == pytest.approx(0.5)
    want = np.sqrt(np.mean((t[np.frombuffer(codes, np.uint8)] / 32768.0) ** 2))
    assert rms == pytest.approx(float(want), abs=1e-12)
    acodes = bytes(_linear2alaw(int(v)) for v in lin)
    rate, dur, rms_a = decode_wav(_wav(6, 8, acodes))
    # companded RMS tracks the linear signal's RMS closely
    lin_rms = np.sqrt(np.mean((lin / 32768.0) ** 2))
    assert rms == pytest.approx(lin_rms, rel=0.02)
    assert rms_a == pytest.approx(lin_rms, rel=0.02)


def test_pcm_widths_and_float():
    x = np.array([0.0, 0.5, -0.5, 0.25], dtype=np.float64)
    # 16-bit (stdlib-compatible path must agree with encode_wav roundtrip)
    q16 = (x * 32767).astype(np.int16)  # astype truncates toward zero
    rate, dur, rms = decode_wav(encode_wav(q16, 16000))
    assert rate == 16000
    assert rms == pytest.approx(np.sqrt(np.mean((q16 / 32768.0) ** 2)), abs=1e-12)
    # 8-bit unsigned PCM
    u8 = ((x * 127) + 128).astype(np.uint8).tobytes()
    _, _, rms8 = decode_wav(_wav(1, 8, u8))
    assert rms8 == pytest.approx(np.sqrt(np.mean((x * 127 / 128.0) ** 2)), abs=0.01)
    # 24-bit PCM
    v24 = (x * ((1 << 23) - 1)).astype(np.int64)
    b24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in v24)
    _, _, rms24 = decode_wav(_wav(1, 24, b24))
    assert rms24 == pytest.approx(np.sqrt(np.mean((v24 / float(1 << 23)) ** 2)), abs=1e-9)
    # 32-bit PCM
    _, _, rms32 = decode_wav(_wav(1, 32, (x * (2**31 - 1)).astype("<i4").tobytes()))
    assert rms32 == pytest.approx(np.sqrt(np.mean(x * x)), rel=1e-6)
    # float32 / float64
    _, _, rf32 = decode_wav(_wav(3, 32, x.astype("<f4").tobytes()))
    assert rf32 == pytest.approx(np.sqrt(np.mean(x * x)), rel=1e-6)
    _, _, rf64 = decode_wav(_wav(3, 64, x.astype("<f8").tobytes()))
    assert rf64 == pytest.approx(np.sqrt(np.mean(x * x)), rel=1e-12)


def test_stereo_duration():
    x = np.zeros(800, dtype=np.int16).tobytes()  # 800 samples = 400 stereo frames
    rate, dur, _ = decode_wav(_wav(1, 16, x, rate=8000, ch=2))
    assert dur == pytest.approx(400 / 8000)


def test_invalid_wavs_rejected():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        decode_wav(_wav(2, 4, b"\x00\x00"))  # ADPCM unsupported
    with pytest.raises(ValueError):
        decode_wav(b"not riff at all")

"""Real GIF decode (pure-Python variable-width LZW + numpy — no Pillow).

External conformance is pinned by the canonical 10x10 sample GIF whose
exact bytes and pixel indices are documented byte-for-byte in the public
"What's In A GIF" format walkthrough — a stream produced by a REAL
third-party encoder, so the decoder's code-width growth convention is
checked against the wild, not just against our own encoder. Roundtrips
then drive the width-boundary (3→12 bit) and dict-full/clear paths."""

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.multimodal import (
    DecodeImage,
    _gif_first_frame,
    decode_gif,
    encode_gif,
    is_gif,
)

# GIF89a, 10x10, 4-color global palette (white/red/blue/black), one
# graphic-control extension, single LZW-coded image, trailer.
CANONICAL = bytes.fromhex(
    "474946383961"  # GIF89a
    "0a000a009100 00"  # 10x10, GCT flag + 2-bit table, bg 0, aspect 0
    "ffffff ff0000 0000ff 000000"  # palette
    "21f9040000000000"  # graphic control extension
    "2c000000000a000a0000"  # image descriptor
    "02168c2d99872a1cdc33a00275ec95faa8de608c04914c01003b".replace(" ", "")
)

CANONICAL_IDX = np.array(
    [
        [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
        [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
        [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
        [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
        [1, 1, 1, 0, 0, 0, 0, 2, 2, 2],
        [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
        [2, 2, 2, 0, 0, 0, 0, 1, 1, 1],
        [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
        [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
        [2, 2, 2, 2, 2, 1, 1, 1, 1, 1],
    ]
)
CANONICAL_PAL = np.array(
    [[255, 255, 255], [255, 0, 0], [0, 0, 255], [0, 0, 0]], dtype=np.uint8
)


def test_canonical_fixture_pixels_exact():
    rgb = _gif_first_frame(CANONICAL)
    np.testing.assert_array_equal(rgb, CANONICAL_PAL[CANONICAL_IDX])
    w, h, luma = decode_gif(CANONICAL)
    assert (w, h) == (10, 10)
    want = (
        0.299 * rgb[..., 0].astype(np.float64)
        + 0.587 * rgb[..., 1]
        + 0.114 * rgb[..., 2]
    ).mean()
    assert luma == pytest.approx(float(want), abs=1e-12)


@pytest.mark.parametrize(
    "shape,ncolors",
    [((8, 8), 2), ((33, 17), 5), ((64, 64), 256), ((120, 100), 256), ((257, 1), 2)],
)
def test_roundtrip_across_width_boundaries(shape, ncolors):
    rng = np.random.default_rng(shape[0] * 1000 + ncolors)
    pal = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, shape, dtype=np.uint8)
    b = encode_gif(idx, pal)
    np.testing.assert_array_equal(_gif_first_frame(b), pal[idx])


def test_roundtrip_kwkwk_runs():
    # constant image => maximal KwKwK (code == next_code) exercise
    pal = np.array([[10, 20, 30], [40, 50, 60]], dtype=np.uint8)
    idx = np.zeros((50, 50), dtype=np.uint8)
    np.testing.assert_array_equal(_gif_first_frame(encode_gif(idx, pal)), pal[idx])


def test_interlaced_rows_deinterlaced():
    # build an interlaced variant by hand: reorder rows into the 4-pass
    # storage order and set the interlace flag
    rng = np.random.default_rng(9)
    h, w = 16, 6
    pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, (h, w), dtype=np.uint8)
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    stored = idx[order]  # what an interlacing encoder writes
    b = bytearray(encode_gif(stored, pal))
    # image descriptor flags byte: magic(6)+lsd(7)+gct(4*3)=25; descriptor
    # starts at 25 (0x2C), flags at 25+9
    assert b[25] == 0x2C
    b[25 + 9] |= 0x40
    np.testing.assert_array_equal(_gif_first_frame(bytes(b)), pal[idx])


def test_is_gif_rejects_invalid():
    good = encode_gif(CANONICAL_IDX.astype(np.uint8), CANONICAL_PAL)
    assert is_gif(good)
    assert is_gif(CANONICAL)
    assert not is_gif(b"GIF87a but actually text content here")
    assert not is_gif(b"plain text")
    assert not is_gif(CANONICAL[:-10])  # truncated mid-stream


REAL_FILES = [
    # real-world third-party encoder outputs shipped with OS packages;
    # dims read from each file's own descriptors
    ("/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-90x34.gif", 90, 34),
    ("/usr/share/doc/libxslt1-dev/html/redhat.gif", 44, 41),
    ("/usr/share/doc/libxslt1-dev/html/smallfootonly.gif", 48, 60),
]


@pytest.mark.parametrize("path,w,h", REAL_FILES)
def test_real_world_files_decode(path, w, h):
    import os

    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    gw, gh, luma = decode_gif(open(path, "rb").read())
    assert (gw, gh) == (w, h)
    assert 0.0 <= luma <= 255.0


def test_decode_image_stage_routes_gif():
    batch = pa.table(
        {
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array(
                [CANONICAL, b"GIF89a-prefixed text payload"], pa.binary()
            ),
        }
    )
    out = DecodeImage(strict=False)(batch)
    assert out.column("width")[0].as_py() == 10
    assert out.column("height")[0].as_py() == 10
    # text with a GIF prefix falls to the stub, never crashes
    assert out.column("width")[1].as_py() is not None
    strict = DecodeImage(strict=True)
    strict(batch.slice(0, 1))  # real GIF decodes under strict
    with pytest.raises(NotImplementedError):
        strict(batch.slice(1, 1))

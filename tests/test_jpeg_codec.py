"""Baseline JPEG decode (numpy + stdlib — no libjpeg/Pillow).

External conformance: the decoder reads its Huffman/quant tables from
the stream itself, and the OS ships several REAL libjpeg-encoded
baseline files covering grayscale, 4:4:4, 4:2:0, and restart intervals
— all must decode. The strongest external invariant: CPython's test
data carries the SAME image twice (python.jpg with a JFIF APP0,
python-raw.jpg without); both must decode to bit-identical pixels.
Internally, the vectorized IDCT is pinned against a naive O(N^4)
direct evaluation of the T.81 spec formula, and encoder roundtrips
drive every mode (gray / 4:4:4 / 4:2:0 / restart markers)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.jpeg import (
    decode_jpeg,
    decode_jpeg_pixels,
    encode_jpeg,
    fdct_blocks,
    idct_blocks,
    is_jpeg,
)
from etl_rs_ray.stages.multimodal import DecodeImage

PY311 = "/root/.pyenv/versions/3.11.7/lib/python3.11"
REAL_FILES = [
    # (path, w, h) — real third-party (libjpeg) encoder outputs
    (f"{PY311}/site-packages/IPython/core/tests/2x2.jpg", 2, 2),  # grayscale
    (f"{PY311}/test/imghdrdata/python.jpg", 16, 16),  # 4:2:0
    (
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/flower-of-life.jpg",
        161,
        161,
    ),  # 4:4:4 + DRI 21
    (
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/appengine/tools/"
        "java/jetty12/jetty-home/modules/demo.d/root/images/webtide_logo.jpg",
        245,
        60,
    ),  # 4:4:4
]


def test_idct_matches_naive_spec_formula():
    rng = np.random.default_rng(0)
    F = rng.normal(scale=50, size=(3, 8, 8))

    def a(u):
        return np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)

    naive = np.zeros_like(F)
    for n in range(3):
        for x in range(8):
            for y in range(8):
                naive[n, x, y] = sum(
                    a(u)
                    * a(v)
                    * F[n, u, v]
                    * np.cos((2 * x + 1) * u * np.pi / 16)
                    * np.cos((2 * y + 1) * v * np.pi / 16)
                    for u in range(8)
                    for v in range(8)
                )
    assert np.abs(idct_blocks(F) - naive).max() < 1e-10
    assert np.abs(fdct_blocks(idct_blocks(F)) - F).max() < 1e-10


@pytest.mark.parametrize("path,w,h", REAL_FILES)
def test_real_world_files_decode(path, w, h):
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    gw, gh, luma = decode_jpeg(open(path, "rb").read())
    assert (gw, gh) == (w, h)
    assert 0.0 <= luma <= 255.0


def test_same_image_two_containers_bit_identical():
    a = f"{PY311}/test/imghdrdata/python.jpg"
    b = f"{PY311}/test/imghdrdata/python-raw.jpg"
    if not (os.path.exists(a) and os.path.exists(b)):
        pytest.skip("CPython imghdr test data not present")
    pa_ = decode_jpeg_pixels(open(a, "rb").read())
    pb = decode_jpeg_pixels(open(b, "rb").read())
    np.testing.assert_array_equal(pa_, pb)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [
                128 + 100 * np.sin(xx / 9) * np.cos(yy / 11),
                128 + 80 * np.cos(xx / 13),
                128 + 60 * np.sin((xx + yy) / 15),
            ],
            axis=-1,
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


@pytest.mark.parametrize(
    "kwargs,tol",
    [
        ({}, 4),
        ({"subsample": True}, 12),
        ({"restart_interval": 3}, 4),
        ({"subsample": True, "restart_interval": 2}, 12),
    ],
)
def test_roundtrip_modes(kwargs, tol):
    img = _smooth_rgb(40, 56)
    out = decode_jpeg_pixels(encode_jpeg(img, quality=95, **kwargs))
    assert out.shape == img.shape
    assert np.abs(out.astype(float) - img.astype(float)).max() <= tol


def test_roundtrip_grayscale_and_odd_dims():
    yy, xx = np.mgrid[0:23, 0:17]
    g = (128 + 90 * np.sin(xx / 7) * np.cos(yy / 9)).clip(0, 255).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(g, quality=95))
    assert out.shape == (23, 17, 1)
    assert np.abs(out[..., 0].astype(float) - g.astype(float)).max() <= 4
    # odd dims under 4:2:0 (chroma pad + MCU pad paths)
    img = _smooth_rgb(21, 19)
    out = decode_jpeg_pixels(encode_jpeg(img, quality=95, subsample=True))
    assert out.shape == (21, 19, 3)


def test_flat_gray_block_is_exact():
    # a flat 128 image has zero coefficients everywhere -> exact decode
    img = np.full((16, 16, 3), 128, dtype=np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(img, quality=50))
    np.testing.assert_array_equal(out, img)


PROGRESSIVE_FILES = [
    # real third-party progressive (SOF2) encoder outputs; the stripe
    # images are known-near-white, giving semantic ground truth
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", 493, 58, 200.0),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", 493, 312, 200.0),
    (
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/rust/"
        "html/embedded-book/assets/f3.jpg",
        720,
        477,
        None,
    ),
]


@pytest.mark.parametrize("path,w,h,min_luma", PROGRESSIVE_FILES)
def test_real_progressive_files_decode(path, w, h, min_luma):
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    gw, gh, luma = decode_jpeg(open(path, "rb").read())
    assert (gw, gh) == (w, h)
    assert 0.0 <= luma <= 255.0
    if min_luma is not None:
        # the 'white-stripe' images must actually decode near-white
        assert luma >= min_luma


def test_is_jpeg_rejects_invalid():
    good = encode_jpeg(_smooth_rgb(16, 16))
    assert is_jpeg(good)
    assert not is_jpeg(b"\xff\xd8 then garbage")
    assert not is_jpeg(good[:-20])  # truncated entropy data


def test_decode_image_stage_routes_jpeg():
    img = _smooth_rgb(24, 31)
    batch = pa.table(
        {
            "media_type": pa.array(["image", "image"], pa.string()),
            "payload": pa.array(
                [encode_jpeg(img, quality=90), b"\xff\xd8\xffJPEG-ish garbage"],
                pa.binary(),
            ),
        }
    )
    out = DecodeImage(strict=False)(batch)
    assert out.column("width")[0].as_py() == 31
    assert out.column("height")[0].as_py() == 24
    strict = DecodeImage(strict=True)
    strict(batch.slice(0, 1))  # real baseline JPEG decodes under strict
    with pytest.raises(NotImplementedError):
        strict(batch.slice(1, 1))

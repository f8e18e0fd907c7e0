"""Real multimodal decode path (VERDICT r3 item 3): the dependency-free
PPM/BMP codec exercises `decode_image`'s non-stub branch and
`extract_features`' decoded schema with genuine pixel data — no codec
libraries required."""

import pytest

from end_to_end_azure_data_engineering_spark.functions import multimodal as MM
from end_to_end_azure_data_engineering_spark.functions.imagecodec import (
    DecodedImage,
    decode_any,
    decode_bmp,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)

# 3x2 test image (width 3 forces BMP row padding: stride 12 vs 9 bytes):
# row 0: red, green, blue; row 1: white, black, mid-gray
PIXELS = bytes(
    [255, 0, 0, 0, 255, 0, 0, 0, 255]
    + [255, 255, 255, 0, 0, 0, 128, 128, 128]
)


def test_ppm_round_trip():
    img = decode_ppm(encode_ppm(3, 2, PIXELS))
    assert (img.width, img.height, img.pixels) == (3, 2, PIXELS)


def test_ppm_ascii_and_comments():
    ascii_ppm = b"P3\n# a comment\n2 1\n255\n255 0 0  0 0 255\n"
    img = decode_ppm(ascii_ppm)
    assert (img.width, img.height) == (2, 1)
    assert img.pixels == bytes([255, 0, 0, 0, 0, 255])


def test_ppm_maxval_rescale():
    img = decode_ppm(b"P3\n1 1\n15\n15 0 7\n")
    assert img.pixels == bytes([255, 0, 7 * 255 // 15])


def test_bmp_round_trip_with_stride_padding():
    payload = encode_bmp(3, 2, PIXELS)
    img = decode_bmp(payload)
    assert (img.width, img.height, img.pixels) == (3, 2, PIXELS)


def test_decode_any_sniffs_and_rejects():
    assert decode_any(encode_ppm(3, 2, PIXELS)).pixels == PIXELS
    assert decode_any(encode_bmp(3, 2, PIXELS)).pixels == PIXELS
    with pytest.raises(ValueError, match="unknown image format"):
        decode_any(b"\x89PNG not supported")


def test_mean_luma():
    white = DecodedImage(2, 1, bytes([255] * 6))
    assert white.mean_luma() == pytest.approx(255.0)
    red = DecodedImage(1, 1, bytes([255, 0, 0]))
    assert red.mean_luma() == pytest.approx(0.299 * 255)


def test_decode_image_non_stub_branch():
    # The injected-decoder branch returns a real decoded image, not a stub.
    img = MM.decode_image(encode_ppm(3, 2, PIXELS), decoder=decode_any)
    assert (img.width, img.height) == (3, 2)


def test_extract_features_real_decode(spark):
    rows = [
        (1, "image", bytearray(encode_ppm(3, 2, PIXELS)), 3, 2, None, None),
        (2, "image", bytearray(encode_bmp(3, 2, PIXELS)), 3, 2, None, None),
        (3, "image", bytearray(b"not an image"), None, None, None, None),
        (4, "audio", None, None, None, 16000, 1000),
    ]
    media = spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)
    out = {r.media_id: r for r in MM.extract_features(media, decoder=decode_any).collect()}

    # real decoded dimensions flow into the feature schema
    expect_luma = DecodedImage(3, 2, PIXELS).mean_luma()
    for mid in (1, 2):
        assert (out[mid].decoded_width, out[mid].decoded_height) == (3, 2)
        assert out[mid].mean_luma == pytest.approx(expect_luma)
    # undecodable / null payloads degrade to nulls, not failures
    assert out[3].decoded_width is None and out[4].decoded_width is None
    # byte-level features still present alongside
    assert out[1].n_bytes == len(encode_ppm(3, 2, PIXELS))
    assert len(out[1].content_hash) == 32

    # decoder-less call keeps the original schema exactly
    plain = MM.extract_features(media)
    assert "decoded_width" not in plain.columns


def test_corrupt_bmp_rejected_not_crashed():
    """Truncated headers and absurd declared dimensions must reject with
    ValueError (the decoder's documented type), never struct.error or a
    pre-validation MemoryError allocation."""
    import struct

    import pytest as _pytest

    from end_to_end_azure_data_engineering_spark.functions.imagecodec import decode_bmp

    with _pytest.raises(ValueError, match="truncated header"):
        decode_bmp(b"BM" + b"\x00" * 10)  # shorter than the fixed headers
    # well-formed prefix declaring a gigapixel raster
    huge = bytearray(64)
    huge[0:2] = b"BM"
    struct.pack_into("<I", huge, 10, 54)
    struct.pack_into("<Iii", huge, 14, 40, 1 << 29, 1 << 29)
    struct.pack_into("<HHI", huge, 26, 1, 24, 0)
    with _pytest.raises(ValueError, match="implausible"):
        decode_bmp(bytes(huge))


def test_decoded_features_null_out_corrupt_payloads(spark):
    """extract_features' decoded path: a malformed BMP row yields nulls in
    the decoded columns; the job never aborts (the rejected-row contract)."""
    from pyspark.sql import functions as F

    from end_to_end_azure_data_engineering_spark.functions.imagecodec import (
        decode_any, encode_bmp,
    )
    from end_to_end_azure_data_engineering_spark.functions.multimodal import (
        extract_features,
    )

    good = encode_bmp(2, 2, bytes(range(12)))
    rows = [(1, "image", bytearray(good)), (2, "image", bytearray(b"BM\x00\x01"))]
    media = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    out = {r.media_id: r for r in extract_features(media, decoder=decode_any).collect()}
    assert out[1].decoded_width == 2 and out[1].decoded_height == 2
    assert out[2].decoded_width is None and out[2].mean_luma is None

"""Real BMP codec kernels (operators/multimodal.py): encode/decode
roundtrip, spec-level details (bottom-up rows, BGR order, 4-byte padding,
top-down flag), corrupt-input degradation, and the nearest-neighbor resize
contract the DuckDB oracle mirrors arithmetically.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from stock_market_data_pipeline_spark.operators.multimodal import (
    bmp_row_stride,
    decode_image,
    encode_bmp,
    extract_image_features,
    resize_images,
    synthesize_bmp_assets,
)


def _gradient(w: int, h: int, rb: int, gb: int, bb: int) -> np.ndarray:
    x = np.arange(w, dtype=np.uint8)
    y = np.arange(h, dtype=np.uint8)[:, None]
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = rb + x
    img[:, :, 1] = gb + y
    img[:, :, 2] = bb + x + y
    return img


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 16])  # all stride paddings
@pytest.mark.parametrize("h", [1, 3, 9])
def test_roundtrip_all_paddings(w, h):
    rng = np.random.default_rng(w * 100 + h)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_bmp(img)
    assert len(data) == 54 + bmp_row_stride(w) * h
    out = decode_image(data)
    assert out is not None and out.shape == (h, w, 3)
    np.testing.assert_array_equal(out, img)


def test_decode_is_spec_level_not_roundtrip_inverse():
    """Hand-build the BMP bytes (no encode_bmp involved) so a matched
    encoder/decoder bug can't cancel out: 2×2, bottom-up, BGR, stride 8."""
    # top-down RGB image: [[red, green], [blue, white]]
    red, green, blue, white = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + 16, 0, 0, 54, 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0,
    )
    # bottom-up: file row 0 = image bottom row [blue, white]; BGR per pixel;
    # 2 pad bytes per row (2*3=6 -> stride 8)
    pixels = bytes(
        [255, 0, 0, 255, 255, 255, 0, 0]  # blue(BGR), white, pad
        + [0, 0, 255, 0, 255, 0, 0, 0]  # red(BGR), green, pad
    )
    out = decode_image(header + pixels)
    assert out is not None
    np.testing.assert_array_equal(out, np.array([[red, green], [blue, white]], dtype=np.uint8))


def test_decode_top_down_negative_height():
    img = _gradient(5, 4, 10, 20, 30)
    data = bytearray(encode_bmp(img))
    # flip the height sign -> rows are now declared top-down; re-order the
    # pixel rows to match so the decoded image must be identical
    struct.pack_into("<i", data, 22, -4)
    stride = bmp_row_stride(5)
    rows = [bytes(data[54 + i * stride : 54 + (i + 1) * stride]) for i in range(4)]
    data[54:] = b"".join(reversed(rows))
    out = decode_image(bytes(data))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize(
    "bad",
    [
        None,
        b"",
        b"BM",  # truncated header
        b"PNG" + b"\x00" * 60,  # wrong magic
        encode_bmp(_gradient(4, 3, 0, 0, 0))[:40],  # truncated pixels
    ],
)
def test_decode_rejects_garbage(bad):
    assert decode_image(bad) is None


def test_decode_rejects_unsupported_variants():
    data = bytearray(encode_bmp(_gradient(4, 3, 0, 0, 0)))
    bpp8 = bytearray(data)
    struct.pack_into("<H", bpp8, 28, 8)
    assert decode_image(bytes(bpp8)) is None
    rle = bytearray(data)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8 compression
    assert decode_image(bytes(rle)) is None


def test_synthesized_features_match_closed_form(spark):
    docs = spark.createDataFrame([(i,) for i in range(0, 60, 7)], "doc_id long")
    feats = {
        r["asset_id"]: r
        for r in extract_image_features(synthesize_bmp_assets(docs)).collect()
    }
    for d in range(0, 60, 7):
        r = feats[d]
        w, h = 4 + d % 13, 3 + d % 7
        rb, gb, bb = d % 200, (7 * d) % 200, (13 * d) % 200
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_bytes"] == 54 + bmp_row_stride(w) * h
        assert r["decode_ok"] and r["mode"] == "RGB"
        assert r["mean_r"] == round(rb + (w - 1) / 2 + 1e-9, 6)
        assert r["mean_g"] == round(gb + (h - 1) / 2 + 1e-9, 6)
        assert r["mean_b"] == round(bb + (w - 1) / 2 + (h - 1) / 2 + 1e-9, 6)
        assert (r["top_left_r"], r["top_left_g"], r["top_left_b"]) == (rb, gb, bb)


def test_resize_nearest_neighbor_contract(spark):
    docs = spark.createDataFrame([(11,), (24,)], "doc_id long")
    rz = {
        r["asset_id"]: r
        for r in resize_images(
            synthesize_bmp_assets(docs), target_w=7, target_h=5
        ).collect()
    }
    for d in (11, 24):
        r = rz[d]
        w, h = 4 + d % 13, 3 + d % 7
        rb, gb, bb = d % 200, (7 * d) % 200, (13 * d) % 200
        avg_x = sum((dx * w) // 7 for dx in range(7)) / 7
        avg_y = sum((dy * h) // 5 for dy in range(5)) / 5
        assert r["resize_ok"]
        assert r["resized_bytes"] == 54 + bmp_row_stride(7) * 5 == 174
        assert r["mean_r"] == round(rb + avg_x + 1e-9, 6)
        assert r["mean_g"] == round(gb + avg_y + 1e-9, 6)
        assert r["mean_b"] == round(bb + avg_x + avg_y + 1e-9, 6)
        # floor mapping sends dst (0,0) to src (0,0)
        assert (r["top_left_r"], r["top_left_g"], r["top_left_b"]) == (rb, gb, bb)


def test_feature_extraction_degrades_on_garbage_rows(spark):
    assets = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(_gradient(3, 2, 5, 6, 7)))),
            (2, bytearray(b"not a bmp")),
            (3, None),
        ],
        "asset_id long, content binary",
    ).withColumn("modality", __import__("pyspark").sql.functions.lit("image"))
    rows = {r["asset_id"]: r for r in extract_image_features(assets).collect()}
    assert rows[1]["decode_ok"] and rows[1]["width"] == 3
    assert not rows[2]["decode_ok"] and rows[2]["width"] is None
    assert not rows[3]["decode_ok"] and rows[3]["n_bytes"] == 0

"""BMP codec: lossless round-trips (incl. non-multiple-of-4 widths), color
BGR/BGRA reduction, top-down bitmaps, hostile bounds, decode_page routing."""

import struct

import numpy as np
import pytest

from tableextraction_spark.bmp import _FILEHDR, _INFOHDR, decode_bmp, encode_bmp_gray
from tableextraction_spark.media import decode_page


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 5 + y * 3) % 256).astype(np.uint8)


@pytest.mark.parametrize("w", [32, 33, 34, 35])  # row padding at every phase
def test_roundtrip_exact_all_paddings(w):
    img = _gradient(17, w)
    assert np.array_equal(decode_bmp(encode_bmp_gray(img)), img)


def _bmp24(rgb: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = rgb.shape
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = rgb[:, :, ::-1]
    rows[:, : w * 3] = (bgr if top_down else bgr[::-1]).reshape(h, w * 3)
    data_off = _FILEHDR.size + _INFOHDR.size
    out = _FILEHDR.pack(b"BM", data_off + rows.size, 0, 0, data_off)
    out += _INFOHDR.pack(40, w, -h if top_down else h, 1, 24, 0, rows.size, 0, 0, 0, 0)
    return out + rows.tobytes()


def test_24bit_bgr_reduces_to_luma():
    rgb = np.dstack([_gradient(9, 13), _gradient(9, 13), _gradient(9, 13)])
    out = decode_bmp(_bmp24(rgb))
    # equal channels → luma == channel value (gray path through float BT.601)
    assert out.shape == (9, 13)
    assert np.abs(out.astype(int) - rgb[:, :, 0].astype(int)).max() <= 1


def test_top_down_equals_bottom_up():
    rgb = np.dstack([_gradient(8, 12)] * 3)
    assert np.array_equal(decode_bmp(_bmp24(rgb)), decode_bmp(_bmp24(rgb, top_down=True)))


def test_rle_compression_is_named_error():
    blob = bytearray(encode_bmp_gray(_gradient(8, 8)))
    struct.pack_into("<I", blob, _FILEHDR.size + 16, 1)  # biCompression = RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(blob))


def test_truncated_pixels_is_error():
    blob = encode_bmp_gray(_gradient(20, 20))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(blob[: len(blob) - 50])


def test_not_bmp_raises():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"GIF89a")


def test_decode_page_routes_bmp():
    img = _gradient(25, 31)
    assert np.array_equal(decode_page(encode_bmp_gray(img)), img)

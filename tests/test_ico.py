"""ICO/CUR codec: round trips, hand-built DIB depths, masks, hostile input,
and router/probe integration (favicon lane)."""

import struct

import numpy as np
import pytest

from tableextraction_spark.ico import (
    decode_ico,
    encode_ico_gray,
    encode_ico_png,
    ico_probe,
    is_ico_magic,
)

_ICONDIR = struct.Struct("<HHH")
_ENTRY = struct.Struct("<BBBBHHII")
_INFOHDR = struct.Struct("<IiiHHIIiiII")


def _img(h, w, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w), dtype=np.uint8)


def _build_dib_ico(w, h, bpp, pal_rgb, idx_rows, and_bits=None, comp=0):
    """Hand-assemble a single-entry DIB ICO at an arbitrary bit depth."""
    xor_rb = (w * bpp + 31) // 32 * 4
    and_rb = (w + 31) // 32 * 4
    n_pal = len(pal_rgb)
    pal = np.zeros((n_pal, 4), np.uint8)
    pal[:, 0] = [c[2] for c in pal_rgb]  # BGRA quads
    pal[:, 1] = [c[1] for c in pal_rgb]
    pal[:, 2] = [c[0] for c in pal_rgb]
    xor = np.zeros((h, xor_rb), np.uint8)
    for y, row in enumerate(idx_rows):
        if bpp == 8:
            xor[h - 1 - y, :w] = row
        else:
            bits = np.zeros(xor_rb * 8, np.uint8)
            for x, v in enumerate(row):
                for b in range(bpp):
                    bits[x * bpp + b] = (v >> (bpp - 1 - b)) & 1
            xor[h - 1 - y] = np.packbits(bits)
    if and_bits is None:
        mask = np.zeros((h, and_rb), np.uint8)
    else:
        mask = np.zeros((h, and_rb), np.uint8)
        for y, row in enumerate(and_bits):
            bits = np.zeros(and_rb * 8, np.uint8)
            bits[: len(row)] = row
            mask[h - 1 - y] = np.packbits(bits)
    dib = (
        _INFOHDR.pack(40, w, 2 * h, 1, bpp, comp, 0, 0, 0, n_pal, 0)
        + pal.tobytes()
        + xor.tobytes()
        + mask.tobytes()
    )
    return (
        _ICONDIR.pack(0, 1, 1)
        + _ENTRY.pack(w % 256, h % 256, 0, 0, 1, bpp, len(dib), 22)
        + dib
    )


def test_dib_gray_roundtrip_exact():
    img = _img(19, 31)
    assert np.array_equal(decode_ico(encode_ico_gray(img)), img)


def test_png_flavor_roundtrip_exact():
    img = _img(16, 16, seed=7)
    blob = encode_ico_png(img)
    assert is_ico_magic(blob)
    assert np.array_equal(decode_ico(blob), img)


def test_256_convention_roundtrip():
    img = _img(256, 256, seed=5)
    blob = encode_ico_gray(img)
    p = ico_probe(blob)
    assert (p["width"], p["height"]) == (256, 256)  # 0 byte means 256
    assert np.array_equal(decode_ico(blob), img)


def test_1bit_paletted():
    pal = [(0, 0, 0), (255, 255, 255)]
    rows = [[0, 1, 0, 1, 1], [1, 0, 0, 0, 1], [0, 0, 1, 1, 0]]
    out = decode_ico(_build_dib_ico(5, 3, 1, pal, rows))
    assert np.array_equal(out, np.array(rows, np.uint8) * 255)


def test_4bit_paletted():
    pal = [(i * 16, i * 16, i * 16) for i in range(16)]
    rows = [[0, 15, 3, 9], [7, 1, 14, 2]]
    out = decode_ico(_build_dib_ico(4, 2, 4, pal, rows))
    assert np.array_equal(out, (np.array(rows, np.uint8) * 16))


def test_and_mask_forces_white():
    pal = [(0, 0, 0), (128, 128, 128)]
    rows = [[1, 1, 1, 1]]
    mask = [[0, 1, 0, 1]]
    out = decode_ico(_build_dib_ico(4, 1, 1, pal, rows, and_bits=mask))
    assert out.tolist() == [[128, 255, 128, 255]]


def test_32bpp_alpha_composites_over_white():
    # one opaque black pixel, one half-transparent black, one fully
    # transparent (alpha 0 would normally mean legacy-opaque, so keep at
    # least one nonzero alpha in the plane to engage compositing)
    w, h = 3, 1
    px = np.zeros((h, w, 4), np.uint8)  # BGRA
    px[0, 0] = (0, 0, 0, 255)
    px[0, 1] = (0, 0, 0, 128)
    px[0, 2] = (0, 0, 0, 0)
    xor_rb = (w * 32 + 31) // 32 * 4
    and_rb = (w + 31) // 32 * 4
    dib = (
        _INFOHDR.pack(40, w, 2 * h, 1, 32, 0, 0, 0, 0, 0, 0)
        + px[::-1].tobytes()
        + bytes(and_rb * h)
    )
    assert xor_rb == w * 4
    blob = (
        _ICONDIR.pack(0, 1, 1)
        + _ENTRY.pack(w, h, 0, 0, 1, 32, len(dib), 22)
        + dib
    )
    out = decode_ico(blob)
    assert out[0, 0] == 0
    assert out[0, 2] == 255
    assert 120 <= out[0, 1] <= 135  # ~half blend


def test_largest_entry_wins():
    small = _img(8, 8, seed=1)
    big = _img(32, 32, seed=2)
    b_small = encode_ico_gray(small)
    b_big = encode_ico_gray(big)
    # splice a two-entry directory: entries point at each blob's DIB
    dib_small = b_small[22:]
    dib_big = b_big[22:]
    hdr = _ICONDIR.pack(0, 1, 2)
    off0 = _ICONDIR.size + 2 * _ENTRY.size
    e0 = _ENTRY.pack(8, 8, 0, 0, 1, 8, len(dib_small), off0)
    e1 = _ENTRY.pack(32, 32, 0, 0, 1, 8, len(dib_big), off0 + len(dib_small))
    blob = hdr + e0 + e1 + dib_small + dib_big
    assert np.array_equal(decode_ico(blob), big)
    p = ico_probe(blob)
    assert (p["width"], p["height"], p["n_frames"]) == (32, 32, 2)


@pytest.mark.parametrize(
    "blob, msg",
    [
        (b"\x00\x00\x01\x00", "truncated directory"),
        (_ICONDIR.pack(0, 1, 0), "zero directory entries"),
        (_ICONDIR.pack(0, 3, 1) + bytes(16), "not an ICO"),
        (
            _ICONDIR.pack(0, 1, 1) + _ENTRY.pack(4, 4, 0, 0, 1, 8, 4096, 22),
            "out of range",
        ),
    ],
)
def test_hostile_inputs_raise_named(blob, msg):
    with pytest.raises(ValueError, match=msg):
        decode_ico(blob)


def test_rle_compression_refused():
    pal = [(0, 0, 0), (255, 255, 255)]
    blob = _build_dib_ico(4, 1, 8, pal + [(0, 0, 0)] * 254,
                          [[0, 1, 0, 1]], comp=1)
    with pytest.raises(ValueError, match="compression"):
        decode_ico(blob)


def test_encode_rejects_oversize():
    with pytest.raises(ValueError, match="256"):
        encode_ico_gray(np.zeros((300, 10), np.uint8))


def test_decode_page_routes_ico():
    from tableextraction_spark.media import decode_page

    img = _img(12, 20, seed=9)
    assert np.array_equal(decode_page(encode_ico_gray(img)), img)
    assert np.array_equal(decode_page(encode_ico_png(img)), img)


def test_probe_bytes_identifies_ico_and_rejects_garbage():
    from tableextraction_spark.probe import probe_bytes

    img = _img(10, 10)
    p = probe_bytes(encode_ico_gray(img))
    assert (p["format"], p["kind"], p["width"], p["height"], p["n_frames"]) \
        == ("ico", "image", 10, 10, 1)
    # ICO magic + garbage directory must inventory as unknown, never raise
    g = probe_bytes(b"\x00\x00\x01\x00" + b"\xff" * 8)
    assert g["format"] == "unknown"

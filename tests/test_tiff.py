"""TIFF 6.0 / BigTIFF lane: every compression round-trips against the
fixture writer, the TIFF-variant LZW (MSB-first, early change) crosses
code-width boundaries correctly, strips/tiles/endianness/fill-order/
photometrics decode, hostile containers are bounded, unsupported corners
raise named errors, and the page pipeline consumes G4 TIFF pages
pixel-exactly."""

import struct
import zlib

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
import pytest

from tableextraction_spark.tiff import (
    _lzw_decode,
    _lzw_encode,
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff_gray,
    encode_tiff_multipage,
    iter_tiff_pages,
    tiff_page_count,
    tiff_probe,
)


def _gradient(h, w, shift=0):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 5 + shift) % 256).astype(np.uint8)


def _binary(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.where((x // 7 + y // 5) % 2 == 0, 0, 255).astype(np.uint8)


@pytest.mark.parametrize(
    "comp", ["none", "packbits", "lzw", "deflate", "g4", "g3"]
)
def test_lossless_roundtrip(comp):
    img = _binary(61, 83) if comp in ("g4", "g3") else _gradient(61, 83)
    dec = decode_tiff(encode_tiff_gray(img, comp))
    assert dec.dtype == np.uint8 and (dec == img).all()


def test_jpeg_compression_roundtrip_near_lossless():
    img = _gradient(48, 64)
    dec = decode_tiff(encode_tiff_gray(img, "jpeg"))
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 6


def test_lzw_crosses_code_width_boundaries():
    # >511 table entries forces the 9→10 bit early change on both sides
    data = bytes(
        ((np.arange(60_000) * 2654435761) % 251).astype(np.uint8)
    )
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_lzw_table_reset_roundtrip():
    # enough distinct phrases to hit the 4094-entry reset
    data = bytes(
        ((np.arange(300_000) * 40503 + np.arange(300_000) // 7) % 256)
        .astype(np.uint8)
    )
    assert _lzw_decode(_lzw_encode(data), len(data)) == data


def test_packbits_roundtrip():
    data = b"\x00" * 300 + b"abcdef" + b"\xff" * 2 + b"x"
    assert _packbits_decode(_packbits_encode(data), len(data)) == data


def test_multipage_chain():
    imgs = [_gradient(30, 40, s) for s in range(3)]
    t = encode_tiff_multipage(imgs, "deflate")
    assert tiff_page_count(t) == 3
    for i, (pno, n, page) in enumerate(iter_tiff_pages(t)):
        assert (pno, n) == (i, 3) and (page == imgs[i]).all()
    assert (decode_tiff(t, page=2) == imgs[2]).all()


def test_big_endian_decodes():
    # byte-swap the whole classic little-endian structure by hand: build a
    # minimal MM file (uncompressed, single strip)
    img = _gradient(5, 7)
    h, w = img.shape
    # header, one IFD with 8 entries, then pixel data
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (278, 3, 1, h), (279, 4, 1, h * w),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, ft, cnt, val in entries:
        if ft == 3:
            ifd += struct.pack(">HHIHH", tag, ft, cnt, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, ft, cnt, val)
    ifd += struct.pack(">I", 0)
    data_off = 8 + len(ifd)
    ifd = bytearray(ifd)
    # patch strip offset (entry index 5, value field at 2 + 5*12 + 8)
    struct.pack_into(">I", ifd, 2 + 5 * 12 + 8, data_off)
    buf = struct.pack(">2sHI", b"MM", 42, 8) + bytes(ifd) + img.tobytes()
    assert (decode_tiff(buf) == img).all()
    assert tiff_probe(buf)["codec"] == "none"


def test_bigtiff_header_parses():
    img = _gradient(5, 7)
    h, w = img.shape
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 16, 1, 0), (278, 3, 1, h), (279, 16, 1, h * w),
    ]
    ifd = struct.pack("<Q", len(entries))
    for tag, ft, cnt, val in entries:
        if ft == 3:
            ifd += struct.pack("<HHQH6x", tag, ft, cnt, val)
        else:
            ifd += struct.pack("<HHQQ", tag, ft, cnt, val)
    ifd += struct.pack("<Q", 0)
    data_off = 16 + len(ifd)
    ifd = bytearray(ifd)
    struct.pack_into("<Q", ifd, 8 + 5 * 20 + 12, data_off)  # strip offset
    buf = struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16) + bytes(ifd) + img.tobytes()
    assert (decode_tiff(buf) == img).all()
    assert tiff_probe(buf)["n_frames"] == 1


def test_fill_order_2_reverses_fax_bits():
    img = _binary(20, 33)
    t = bytearray(encode_tiff_gray(img, "g4"))
    # locate the single strip: flip FillOrder to 2 and bit-reverse the data
    from tableextraction_spark.tiff import _BIT_REVERSE, _read_ifds

    ifd = _read_ifds(bytes(t))[1][0]
    off, cnt = ifd[273][0], ifd[279][0]
    t[off : off + cnt] = bytes(t[off : off + cnt]).translate(_BIT_REVERSE)
    # append FillOrder tag by rebuilding is overkill — instead decode must
    # FAIL without the tag (bits are garbage) and succeed with it; simplest
    # injection: rewrite the Photometric tag id (262) slot? No — build the
    # tag properly: bump entry count and insert before 273.
    n = struct.unpack_from("<H", t, 8)[0]
    entries = [bytes(t[10 + 12 * i : 10 + 12 * (i + 1)]) for i in range(n)]
    fill = struct.pack("<HHIHH", 266, 3, 1, 2, 0)
    entries = [e for e in entries]
    entries.insert(3, fill)  # tags sorted: 258,259,262,266,273,...
    rebuilt = (
        bytes(t[:8])
        + struct.pack("<H", n + 1)
        + b"".join(entries)
        + bytes(t[10 + 12 * n :])
    )
    # every pointer in the file shifted by 12 — patch offsets > header
    ifd2 = _read_ifds(rebuilt)[1][0]
    assert ifd2[266] == [2]
    shifted = bytearray(rebuilt)
    at = 10 + 12 * (entries.index(next(e for e in entries if e[:2] == struct.pack("<H", 273))))
    (old_off,) = struct.unpack_from("<I", shifted, at + 8)
    struct.pack_into("<I", shifted, at + 8, old_off + 12)
    assert (decode_tiff(bytes(shifted)) == img).all()


def test_photometric_whitezero_gray_inverts():
    img = _gradient(9, 11)
    t = bytearray(encode_tiff_gray(img, "none"))
    # flip Photometric 1 → 0 (tag 262 value)
    n = struct.unpack_from("<H", t, 8)[0]
    for i in range(n):
        at = 10 + 12 * i
        if struct.unpack_from("<H", t, at)[0] == 262:
            struct.pack_into("<H", t, at + 8, 0)
    assert (decode_tiff(bytes(t)) == 255 - img).all()


def test_named_errors():
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX\x2a\x00" + b"\x00" * 16)
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"II\x2b\x01" + b"\x00" * 16)
    img = _gradient(9, 11)
    t = bytearray(encode_tiff_gray(img, "none"))
    n = struct.unpack_from("<H", t, 8)[0]
    for i in range(n):
        at = 10 + 12 * i
        if struct.unpack_from("<H", t, at)[0] == 259:
            struct.pack_into("<H", t, at + 8, 6)  # old-style JPEG
    with pytest.raises(ValueError, match="old-style"):
        decode_tiff(bytes(t))


def test_ifd_loop_refused():
    img = _gradient(5, 5)
    t = bytearray(encode_tiff_gray(img, "none"))
    n = struct.unpack_from("<H", t, 8)[0]
    struct.pack_into("<I", t, 10 + 12 * n, 8)  # next-IFD → itself
    with pytest.raises(ValueError, match="loops"):
        tiff_page_count(bytes(t))


def test_truncated_strip_raises_not_hangs():
    img = _gradient(40, 50)
    t = encode_tiff_gray(img, "lzw")
    with pytest.raises(ValueError):
        decode_tiff(t[: len(t) - 40])


def test_decode_page_routes_tiff():
    from tableextraction_spark.media import decode_page

    img = _binary(25, 31)
    assert (decode_page(encode_tiff_gray(img, "g4")) == img).all()
    assert (decode_page(encode_tiff_gray(_gradient(25, 31), "lzw"))
            == _gradient(25, 31)).all()


def test_probe_reports_tiff():
    from tableextraction_spark.probe import probe_bytes

    t = encode_tiff_multipage([_binary(25, 31)] * 4, "g4")
    p = probe_bytes(t)
    assert p["format"] == "tiff" and p["kind"] == "image"
    assert p["n_frames"] == 4 and (p["width"], p["height"]) == (31, 25)
    assert p["codec"] == "ccitt-g4"


def test_gen_doc_tiff_codec_pixel_exact():
    from tableextraction_spark.fixtures.generate import gen_doc
    from tableextraction_spark.media import decode_page

    _, blobs_t, _ = gen_doc(5, codec="tiff")
    _, blobs_i, _ = gen_doc(5, codec="img1")
    for bt, bi in zip(blobs_t, blobs_i):
        assert (decode_page(bt["content"]) == decode_page(bi["content"])).all()


def test_tiled_layout_decodes():
    # hand-build a tiled deflate TIFF: 2×2 grid of 16×16 tiles, 30×27 image
    img = _gradient(30, 27)
    tw = th = 16
    tiles = []
    for ty in range(2):
        for tx in range(2):
            tile = np.zeros((th, tw), dtype=np.uint8)
            src = img[ty * th : (ty + 1) * th, tx * tw : (tx + 1) * tw]
            tile[: src.shape[0], : src.shape[1]] = src
            tiles.append(zlib.compress(tile.tobytes()))
    entries = [
        (256, 3, 1, 27), (257, 3, 1, 30), (258, 3, 1, 8), (259, 3, 1, 8),
        (262, 3, 1, 1), (277, 3, 1, 1),
        (322, 3, 1, tw), (323, 3, 1, th),
        (324, 4, 4, None), (325, 4, 4, None),
    ]
    ifd_size = 2 + 12 * len(entries) + 4
    heap = bytearray()
    offsets_pos = counts_pos = None
    body = b""
    for tag, ft, cnt, val in entries:
        if tag == 324:
            offsets_pos = 8 + ifd_size + len(heap)
            heap += b"\x00" * 16
            body += struct.pack("<HHII", tag, ft, cnt, offsets_pos)
        elif tag == 325:
            counts_pos = 8 + ifd_size + len(heap)
            heap += b"\x00" * 16
            body += struct.pack("<HHII", tag, ft, cnt, counts_pos)
        elif ft == 3:
            body += struct.pack("<HHIHH", tag, ft, cnt, val, 0)
        else:
            body += struct.pack("<HHII", tag, ft, cnt, val)
    buf = bytearray(
        struct.pack("<2sHI", b"II", 42, 8)
        + struct.pack("<H", len(entries)) + body + struct.pack("<I", 0)
        + heap
    )
    for i, tdata in enumerate(tiles):
        struct.pack_into("<I", buf, offsets_pos + 4 * i, len(buf))
        struct.pack_into("<I", buf, counts_pos + 4 * i, len(tdata))
        buf += tdata
    assert (decode_tiff(bytes(buf)) == img).all()


def test_mm_16bit_samples_are_header_endian():
    # review finding: native-endian frombuffer byte-swapped MM 16-bit pixels
    img16 = np.array([[0xFF00, 0x0100]], dtype=np.uint16)
    h, w = img16.shape
    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 0), (278, 3, 1, h), (279, 4, 1, h * w * 2),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, ft, cnt, val in entries:
        if ft == 3:
            ifd += struct.pack(">HHIHH", tag, ft, cnt, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, ft, cnt, val)
    ifd += struct.pack(">I", 0)
    ifd = bytearray(ifd)
    struct.pack_into(">I", ifd, 2 + 5 * 12 + 8, 8 + len(ifd))
    buf = struct.pack(">2sHI", b"MM", 42, 8) + bytes(ifd) + img16.astype(">u2").tobytes()
    assert (decode_tiff(buf) == np.array([[255, 1]], dtype=np.uint8)).all()


def test_ycbcr_jpeg_photometric_6_uses_luma():
    # review finding: photometric 6 fell through to the R channel
    from tableextraction_spark.jpeg import encode_jpeg_rgb
    from tableextraction_spark.tiff import _T_PHOTOMETRIC

    red = np.zeros((16, 16, 3), dtype=np.uint8)
    red[:, :, 0] = 200
    # hand-assemble: reuse encode_tiff_gray layout then swap in an RGB JPEG
    # strip + photometric 6 + spp 3
    jpg = encode_jpeg_rgb(red)
    entries = [
        (256, 3, 1, 16), (257, 3, 1, 16), (258, 3, 3, None), (259, 3, 1, 7),
        (262, 3, 1, 6), (273, 4, 1, 0), (277, 3, 1, 3), (278, 3, 1, 16),
        (279, 4, 1, len(jpg)),
    ]
    ifd_size = 2 + 12 * len(entries) + 4
    heap = bytearray()
    body = b""
    bps_pos = None
    for tag, ft, cnt, val in entries:
        if tag == 258:
            bps_pos = 8 + ifd_size + len(heap)
            heap += struct.pack("<3H", 8, 8, 8)
            body += struct.pack("<HHII", tag, ft, cnt, bps_pos)
        elif ft == 3:
            body += struct.pack("<HHIHH", tag, ft, cnt, val, 0)
        else:
            body += struct.pack("<HHII", tag, ft, cnt, val)
    buf = bytearray(
        struct.pack("<2sHI", b"II", 42, 8)
        + struct.pack("<H", len(entries)) + body + struct.pack("<I", 0) + heap
    )
    # patch strip offset (tag 273)
    for e in range(len(entries)):
        at = 10 + 12 * e
        if struct.unpack_from("<H", buf, at)[0] == 273:
            struct.pack_into("<I", buf, at + 8, len(buf))
    buf += jpg
    dec = decode_tiff(bytes(buf))
    luma = 0.299 * 200  # ≈ 60
    assert abs(float(dec.mean()) - luma) < 10  # NOT the R channel (200)


def test_invalid_magic_order_combos_rejected():
    from tableextraction_spark.media import decode_page
    from tableextraction_spark.tiff import is_tiff_magic

    assert is_tiff_magic(b"II*\x00") and is_tiff_magic(b"MM\x00+")
    # crossed combos are NOT tiff and must fall to 'unknown media'
    for head in (b"II\x00*", b"MM*\x00", b"II\x00+", b"MM+\x00"):
        assert not is_tiff_magic(head)
        with pytest.raises(ValueError, match="unknown media"):
            decode_page(head + b"\x00" * 32)


def test_jpeg_strip_dimension_mismatch_named():
    # a JPEG strip declaring the wrong dims must raise a named error,
    # not silently mis-shape the page
    from tableextraction_spark.jpeg import encode_jpeg_gray

    img = _gradient(20, 30)
    t = bytearray(encode_tiff_gray(img, "jpeg"))
    # shrink the declared ImageLength to 10 (strip still decodes 20 rows)
    n = struct.unpack_from("<H", t, 8)[0]
    for e in range(n):
        at = 10 + 12 * e
        if struct.unpack_from("<H", t, at)[0] == 257:
            struct.pack_into("<H", t, at + 8, 10)
        if struct.unpack_from("<H", t, at)[0] == 278:
            struct.pack_into("<H", t, at + 8, 10)
    with pytest.raises(ValueError, match="declared"):
        decode_tiff(bytes(t))


def _tiff_lzw_reference(data, expected):
    """Pre-r5 bytes-table TIFF-LZW algorithm — property-test reference."""
    out = bytearray()
    table = [bytes([i]) for i in range(256)] + [b"", b""]
    width, prev = 9, b""
    nbits = len(data) * 8
    bpos = 0
    while len(out) < expected:
        if bpos + width > nbits:
            raise ValueError("exhausted")
        byte = bpos >> 3
        chunk = int.from_bytes(
            data[byte : byte + 4].ljust(4, b"\0"), "big"
        )
        code = (chunk >> (32 - (bpos & 7) - width)) & ((1 << width) - 1)
        bpos += width
        if code == 257:
            raise ValueError("EOI early")
        if code == 256:
            table = table[:258]
            width, prev = 9, b""
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev:
            entry = prev + prev[:1]
        else:
            raise ValueError("bad code")
        out += entry
        if prev:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out[:expected])


@given(st.lists(st.integers(0, 255), min_size=1, max_size=500))
@settings(deadline=None, max_examples=50)
def test_tiff_lzw_matches_bytes_table_reference(vals):
    """The r5 (src, len) TIFF-LZW decoder must agree byte-for-byte with
    the bytes-table algorithm — repetition drives cSc, deep chains, and
    the early-change width boundary."""
    from tableextraction_spark.tiff import _lzw_decode, _lzw_encode

    raw = bytes((vals * 8)[:3000])
    data = _lzw_encode(raw)
    assert _tiff_lzw_reference(data, len(raw)) == raw  # reference sane
    assert _lzw_decode(data, len(raw)) == raw

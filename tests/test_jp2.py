"""JPEG 2000 codec (ITU-T T.800): DWT/tag-tree/tier-1 primitives, full
encode→decode round-trips across sizes/levels/tiles/progressions/layers/
precincts/components, 9/7 lossy quality, JP2 container + probe, the PDF
``JPXDecode`` integration, and hostile-input bounds.  The encoder is
from-scratch too, so every decode path is pinned without an external
reference encoder (the JBIG2/CCITT pattern)."""

import numpy as np
import pytest

from tableextraction_spark.jp2 import (
    _sd_2d,
    _sr_2d,
    _t1_decode,
    _t1_encode,
    _TagTree,
    decode_jp2,
    encode_jp2_gray,
    encode_jp2_rgb,
    probe_jp2,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 3 + yy * 5) % 256).astype(np.uint8)


# ------------------------------------------------------------- primitives


def test_dwt_roundtrip_reversible_all_parities():
    rng = np.random.default_rng(0)
    for (h, w) in [(1, 1), (1, 7), (8, 8), (5, 9), (16, 1), (64, 48)]:
        for (v0, u0) in [(0, 0), (1, 0), (0, 1), (3, 5)]:
            x = rng.integers(-300, 300, (h, w)).astype(np.int64)
            y = _sd_2d(x, u0, u0 + w, v0, v0 + h, True)
            assert np.array_equal(_sr_2d(y, u0, u0 + w, v0, v0 + h, True), x)


def test_dwt_97_near_exact():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 100, (33, 57))
    y = _sd_2d(x, 0, 57, 0, 33, False)
    assert np.abs(_sr_2d(y, 0, 57, 0, 33, False) - x).max() < 1e-9


def test_tag_tree_roundtrip_random_queries():
    rng = np.random.default_rng(2)
    for _ in range(60):
        w, h = int(rng.integers(1, 9)), int(rng.integers(1, 9))
        vals = rng.integers(0, 6, (h, w))
        enc = _TagTree(w, h)
        enc.set_values(vals)
        bits, queries = [], []
        for _q in range(30):
            x, y, t = (int(rng.integers(0, w)), int(rng.integers(0, h)),
                       int(rng.integers(1, 8)))
            queries.append((x, y, t, enc.encode(x, y, t, bits.append)))
        dec = _TagTree(w, h)
        it = iter(bits)
        for x, y, t, want in queries:
            got = dec.decode(x, y, t, lambda: next(it))
            assert got == want == (vals[y, x] < t)
        assert next(it, None) is None


def test_tier1_roundtrip_matrix():
    rng = np.random.default_rng(3)
    for trial in range(40):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        if h * w > 4096:
            continue
        band = ["LL", "HL", "LH", "HH"][trial % 4]
        if trial % 3 == 1:  # sparse
            c = (rng.random((h, w)) > 0.9) * rng.integers(-1000, 1000, (h, w))
        else:
            c = rng.integers(-200, 200, (h, w))
        totp = max(1, int(np.abs(c).max()).bit_length()
                   + int(rng.integers(0, 3)))
        sm = trial % 5 == 0
        data, npasses, zb = _t1_encode(c.astype(np.int64), band, totp,
                                       segmark=sm)
        if npasses == 0:
            assert not c.any()
            continue
        mag, sign = _t1_decode(data, w, h, band, npasses, totp - zb, sm)
        assert np.array_equal(mag * sign, c)


# ---------------------------------------------------------- full pipeline


@pytest.mark.parametrize("shape,levels", [
    ((1, 1), 0), ((1, 1), 2), ((5, 3), 3), ((33, 47), 4), ((16, 128), 2),
])
def test_lossless_sizes_and_levels(shape, levels):
    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    got = decode_jp2(encode_jp2_gray(img, levels=levels, container="raw"))
    assert np.array_equal(got, img)


@pytest.mark.parametrize("tile", [(32, 32), (33, 70), (16, 16)])
def test_lossless_multitile(tile):
    img = _gradient(70, 90)
    got = decode_jp2(encode_jp2_gray(img, levels=3, tile=tile,
                                     container="raw"))
    assert np.array_equal(got, img)


@pytest.mark.parametrize("mct", [True, False])
def test_lossless_rgb_rct(mct):
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    got = decode_jp2(encode_jp2_rgb(img, mct=mct, levels=2, container="raw"))
    assert np.array_equal(got, img)


@pytest.mark.parametrize("opts", [
    dict(layers=2),
    dict(prog="RLCP"),
    dict(prog="RPCL", layers=2),
    dict(segmark=True),
    dict(eph=True),
    dict(precincts=[(6, 6), (7, 7), (7, 6)], levels=2),
    dict(precincts=[(5, 5), (6, 5), (6, 6), (7, 7)], levels=3, layers=2,
         prog="RLCP"),
    dict(cb=(4, 4)),
    dict(cb=(5, 3)),
], ids=lambda o: ",".join(f"{k}={v}" for k, v in o.items())[:40])
def test_lossless_option_matrix(opts):
    """Layer splits, progression orders, custom precincts (multiple
    precincts per resolution), segmentation symbols, EPH markers, and
    non-square code blocks all reproduce the image exactly."""
    img = _gradient(48, 64)
    o = dict(levels=3)
    o.update(opts)
    got = decode_jp2(encode_jp2_gray(img, container="raw", **o))
    assert np.array_equal(got, img)


def test_lossless_16bit():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 65536, (20, 30), dtype=np.uint16)
    got = decode_jp2(encode_jp2_gray(img, levels=2, container="raw"))
    assert got.dtype == np.uint16 and np.array_equal(got, img)


def test_97_lossy_quality_and_actual_loss():
    """9/7 at a coarse step must actually lose information yet stay
    high-quality; at a fine step it recovers the image bit-exact after
    rounding."""
    rng = np.random.default_rng(12)
    img = (rng.normal(128, 40, (64, 64)).clip(0, 255)).astype(np.uint8)
    coarse = encode_jp2_gray(img, levels=3, reversible=False, qstep=1 / 4,
                             container="raw")
    got = decode_jp2(coarse).astype(np.float64)
    mse = ((got - img) ** 2).mean()
    assert mse > 0.001  # genuinely lossy
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 30
    fine = encode_jp2_gray(img, levels=3, reversible=False, qstep=1 / 4096,
                           container="raw")
    assert np.array_equal(decode_jp2(fine), img)
    assert len(fine) > len(coarse)  # rate follows the step


def test_97_rgb_ict():
    img = np.stack([_gradient(32, 40), np.flipud(_gradient(32, 40)),
                    255 - _gradient(32, 40)], axis=-1)
    data = encode_jp2_rgb(img, mct=True, levels=2, reversible=False,
                          qstep=1 / 128, container="raw")
    got = decode_jp2(data).astype(np.float64)
    psnr = 10 * np.log10(255 ** 2 / max(((got - img) ** 2).mean(), 1e-12))
    assert psnr > 40


@pytest.mark.parametrize("layers", [3, 4, 7])
def test_lossless_many_layers(layers):
    """Pass/byte split generalizes to ANY layer count — layers >= 3 used
    to re-emit the second half every layer (duplicate passes)."""
    img = _gradient(48, 64)
    got = decode_jp2(encode_jp2_gray(img, levels=3, layers=layers,
                                     container="raw"))
    assert np.array_equal(got, img)


def test_layer_split_single_pass_blocks():
    """max |coefficient| == 1 in the high bands → blocks with exactly one
    coding pass; the old two-layer split consumed the pass in layer 0 but
    only half its bytes (silent corruption)."""
    rng = np.random.default_rng(5)
    img = (128 + (rng.random((64, 64)) > 0.97)).astype(np.uint8)
    for layers in (2, 3):
        got = decode_jp2(encode_jp2_gray(img, levels=2, layers=layers,
                                         container="raw"))
        assert np.array_equal(got, img)


def _inject_coc(data: bytes, before_cod: bool) -> bytes:
    """Splice a COC for component 0 (Scoc=0, SPcoc copied from the COD)
    into a raw codestream's main header."""
    import struct

    cod_at = data.find(b"\xff\x52")
    lcod = struct.unpack_from(">H", data, cod_at + 2)[0]
    spcod = data[cod_at + 4 + 5:cod_at + 4 + 10]
    coc = b"\xff\x53" + struct.pack(">H", 9) + bytes([0, 0]) + spcod
    at = cod_at if before_cod else cod_at + 2 + lcod
    return data[:at] + coc + data[at:]


@pytest.mark.parametrize("before_cod", [False, True])
def test_coc_inherits_eph_and_parses_in_any_order(before_cod):
    """SOP/EPH are codestream-wide COD properties (Scoc has no such bits)
    — a COC override must inherit them, and T.800 A.6 allows COC before
    COD in the main header."""
    img = _gradient(40, 56)
    data = encode_jp2_gray(img, levels=2, eph=True, container="raw")
    assert np.array_equal(decode_jp2(_inject_coc(data, before_cod)), img)


def test_zero_tile_size_named_error():
    import struct

    data = bytearray(encode_jp2_gray(_gradient(16, 16), levels=1,
                                     container="raw"))
    siz_at = bytes(data).find(b"\xff\x51")
    struct.pack_into(">I", data, siz_at + 4 + 18, 0)  # XTsiz ← 0
    with pytest.raises(ValueError, match="tile size"):
        decode_jp2(bytes(data))


def test_two_component_gray_alpha():
    """csiz=2 (gray+alpha) decodes, and the gray8 helper keeps the image
    channel instead of indexing a missing third component."""
    from tableextraction_spark.jp2 import _encode_codestream, decode_jp2_gray8

    img = _gradient(20, 26)
    alpha = np.full_like(img, 255)
    cs = _encode_codestream([img, alpha], 8, levels=1)
    assert decode_jp2(cs).shape == (20, 26, 2)
    assert np.array_equal(decode_jp2_gray8(cs), img)


def test_probe_skips_metadata_and_extended_length_boxes():
    """xml/uuid boxes (scanner output) and 64-bit XLBox lengths before
    jp2c must not break the header-only probe."""
    import struct

    img = _gradient(18, 22)
    data = encode_jp2_gray(img, levels=1)
    jp2c_at = data.find(b"jp2c") - 4
    xml = struct.pack(">I", 8 + 8000) + b"xml " + b"<x/>" * 2000
    uuid = (struct.pack(">I", 1) + b"uuid" + struct.pack(">Q", 16 + 32)
            + b"\x00" * 32)
    spliced = data[:jp2c_at] + xml + uuid + data[jp2c_at:]
    assert probe_jp2(spliced) == {"width": 22, "height": 18, "ncomp": 1,
                                  "depth": 8}
    assert np.array_equal(decode_jp2(spliced), img)


# ------------------------------------------------- container + probe + PDF


def test_jp2_container_and_probe():
    img = _gradient(30, 44)
    data = encode_jp2_gray(img, levels=2)  # JP2 box container
    assert data[:4] == b"\x00\x00\x00\x0c"
    assert np.array_equal(decode_jp2(data), img)
    assert probe_jp2(data) == {"width": 44, "height": 30, "ncomp": 1,
                               "depth": 8}
    raw = encode_jp2_gray(img, levels=2, container="raw")
    assert probe_jp2(raw)["width"] == 44
    assert probe_jp2(b"\xff\x4f\x00\x00") == {}


def test_probe_bytes_routes_jp2():
    from tableextraction_spark.probe import probe_bytes

    img = _gradient(24, 36)
    for container in ("jp2", "raw"):
        out = probe_bytes(encode_jp2_gray(img, levels=1,
                                          container=container))
        assert out["format"] == "jp2" and out["kind"] == "image"
        assert (out["width"], out["height"], out["n_frames"]) == (36, 24, 1)


def test_media_decode_page_routes_jp2():
    from tableextraction_spark.media import decode_page

    img = _gradient(28, 52)
    for container in ("jp2", "raw"):
        got = decode_page(encode_jp2_gray(img, levels=2,
                                          container=container))
        assert np.array_equal(got, img)
    # the fused Arrow stage hands SIGNED-format memoryviews — regression
    # for slices never comparing equal to bytes literals
    mv = memoryview(bytearray(encode_jp2_gray(img, levels=2))).cast("b")
    assert np.array_equal(decode_page(mv), img)


def test_pdf_jpx_image_xobject():
    """A PDF whose page is one full-page JPXDecode image rasterizes to the
    source image exactly (lossless 5/3 stream)."""
    from tableextraction_spark import pdfx

    img = _gradient(40, 60)
    data = encode_jp2_gray(img, levels=2, container="raw")
    b = pdfx._Builder()
    im_num = b.add_stream(
        {"Subtype": b"/Image", "Width": b"60", "Height": b"40",
         "BitsPerComponent": b"8", "ColorSpace": b"/DeviceGray",
         "Filter": b"/JPXDecode"},
        data, compress=False,
    )
    content = b.add_stream({}, b"q 60 0 0 40 0 0 cm /Im0 Do Q")
    page = b.add(
        b"<< /Type /Page /Parent 4 0 R /MediaBox [0 0 60 40] /Resources "
        b"<< /XObject << /Im0 %d 0 R >> >> /Contents %d 0 R >>"
        % (im_num, content)
    )
    pages = b.add(b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>" % page)
    assert pages == 4
    root = b.add(b"<< /Type /Catalog /Pages %d 0 R >>" % pages)
    pdf = b.finish(root)
    arr = pdfx.rasterize_pdf_page(pdf)
    # PDF y-axis flip: image row 0 lands at the TOP of the page because
    # the cm maps unit square bottom-up but the rasterizer's canvas is
    # top-down — the draw path handles it; compare directly
    assert np.array_equal(arr, img)


def test_build_scanned_pdf_jpx_codec():
    """The scanned-corpus fixture shape with the JPX archive codec: a
    multi-page PDF whose pages are full-page reversible-5/3 JPEG 2000
    images rasterizes pixel-exactly (cf. the CCITT/JBIG2 slots in
    test_ccitt/test_jbig2 — q55 rotates all five)."""
    from tableextraction_spark import pdfx

    img1 = np.full((80, 160), 255, np.uint8)
    img1[10:16, 12:148] = 0
    img1[40:41, 10:150] = 0
    img2 = np.full((80, 160), 255, np.uint8)
    img2[60:70, 30:60] = 0
    pdf = pdfx.build_scanned_pdf([img1, img2], codec="jpx")
    pages = [arr for _i, _n, arr in pdfx.iter_pdf_pages(pdf)]
    assert len(pages) == 2
    assert np.array_equal(pages[0], img1)
    assert np.array_equal(pages[1], img2)


# ------------------------------------------------------------ bounds


def test_named_refusals_and_hostile_input():
    img = _gradient(16, 16)
    data = bytearray(encode_jp2_gray(img, levels=1, container="raw"))
    # bypass code-block style refused by name
    cod_at = bytes(data).find(b"\xff\x52")
    styled = bytearray(data)
    styled[cod_at + 4 + 8] = 0x01  # SPcod code-block style ← bypass
    with pytest.raises(NotImplementedError, match="bypass"):
        decode_jp2(bytes(styled))
    with pytest.raises(ValueError):
        decode_jp2(b"\xff\x4f\xff\x51" + b"\x00" * 10)
    with pytest.raises(ValueError):
        decode_jp2(b"not a jp2 at all")
    # truncation anywhere must raise a named error, never hang/crash
    for cut in (4, 20, len(data) // 2, len(data) - 3):
        with pytest.raises((ValueError, NotImplementedError, IndexError)):
            decode_jp2(bytes(data[:cut]))


def test_arbitrary_bytes_never_hang():
    import struct

    rng = np.random.default_rng(13)
    for _ in range(40):
        blob = b"\xff\x4f" + bytes(rng.integers(0, 256, 200, dtype=np.uint8))
        try:
            decode_jp2(blob)
        except (ValueError, NotImplementedError, IndexError, KeyError,
                struct.error):
            pass  # named per-row error classes only

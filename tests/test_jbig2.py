"""JBIG2 codec (ITU-T T.88): MQ arithmetic coder round-trips, Annex A
integer coding, generic regions across all templates / AT layouts /
TPGDON / MMR, symbol-dictionary + text-region pages (the jbig2enc
scanner shape) including the PDF ``/JBIG2Globals`` split, hostile-input
bounds, and the PDF ``JBIG2Decode`` integration (pixel-exact pages,
ImageMask stencils, ``/Decode [1 0]``)."""

import numpy as np
import pytest

from tableextraction_spark.jbig2 import (
    encode_jbig2_symbol_page,
    OOB,
    _Ctx,
    _decode_int,
    _encode_int,
    _MQDecoder,
    _MQEncoder,
    decode_jbig2_embedded,
    encode_jbig2_generic,
    encode_jbig2_text_page,
)


def _doc_bitmap(h=120, w=400, seed=3):
    """Document-like 1-bit page: text-line bands + a table grid."""
    rng = np.random.default_rng(seed)
    bm = np.zeros((h, w), np.uint8)
    for r in range(8, h - 20, 13):
        bm[r : r + 6, 12 : w - 12] = rng.random((6, w - 24)) < 0.35
    bm[h - 16 : h - 15, 10 : w - 10] = 1  # rule line
    bm[h - 16 : h - 4, 10:11] = 1
    return bm


CASES = [
    np.zeros((12, 80), np.uint8),
    np.ones((12, 80), np.uint8),
    _doc_bitmap(),
    (np.random.default_rng(7).random((48, 171)) < 0.5).astype(np.uint8),
]
CASE_IDS = ["white", "black", "doc", "noise"]


# ------------------------------------------------------------- MQ coder


def test_mq_bit_roundtrip_skewed_and_balanced():
    rng = np.random.default_rng(0)
    for p in (0.02, 0.3, 0.5, 0.98):
        bits = (rng.random(4000) < p).astype(int).tolist()
        enc, cx = _MQEncoder(), _Ctx(8)
        for b in bits:
            enc.encode(cx, 5, b)
        data = enc.flush()
        dec, cx2 = _MQDecoder(data), _Ctx(8)
        assert [dec.decode(cx2, 5) for _ in bits] == bits
        # adaptive coding must actually compress the skewed streams
        if p in (0.02, 0.98):
            assert len(data) < 4000 // 16


def test_mq_interleaved_contexts():
    """One MQ stream interleaving several context sets — the shape every
    segment decoding procedure relies on."""
    rng = np.random.default_rng(1)
    ops = [(int(rng.integers(0, 4)), int(rng.random() < 0.4))
           for _ in range(2000)]
    enc, cx = _MQEncoder(), _Ctx(4)
    for k, b in ops:
        enc.encode(cx, k, b)
    dec, cx2 = _MQDecoder(enc.flush()), _Ctx(4)
    assert [dec.decode(cx2, k) for k, _ in ops] == [b for _, b in ops]


def test_mq_decoder_survives_truncation():
    """Past the end of the segment the spec feeds 1-bits; decoding from a
    truncated stream must terminate, not raise or hang."""
    enc, cx = _MQEncoder(), _Ctx(2)
    for b in [0, 1] * 500:
        enc.encode(cx, 1, b)
    data = enc.flush()[:10]
    dec, cx2 = _MQDecoder(data), _Ctx(2)
    out = [dec.decode(cx2, 1) for _ in range(1000)]
    assert len(out) == 1000  # termination is the property under test


# ------------------------------------------------- Annex A integer coding


def test_int_roundtrip_every_class_boundary():
    vals = [0, 1, -1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
            123456, 2**20, -(2**20), -4436, -84, OOB, 7, OOB]
    enc, cx = _MQEncoder(), _Ctx(512)
    for v in vals:
        _encode_int(enc, cx, v)
    dec, cx2 = _MQDecoder(enc.flush()), _Ctx(512)
    got = [_decode_int(dec, cx2) for _ in vals]
    assert all(
        (a is OOB and b is OOB) or a == b for a, b in zip(vals, got)
    )


# ------------------------------------------------------- generic regions


@pytest.mark.parametrize("bm", CASES, ids=CASE_IDS)
@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_generic_arith_roundtrip(bm, template):
    out = decode_jbig2_embedded(encode_jbig2_generic(bm, template=template))
    assert np.array_equal(out, bm)


@pytest.mark.parametrize("bm", CASES, ids=CASE_IDS)
def test_generic_mmr_roundtrip(bm):
    out = decode_jbig2_embedded(encode_jbig2_generic(bm, mmr=True))
    assert np.array_equal(out, bm)


@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_generic_tpgdon_roundtrip(template):
    """TPGDON skips repeated rows — blank bands and rule lines are the
    common case on scanned pages."""
    bm = _doc_bitmap(90, 220)
    bm[40:60] = bm[40]  # a band of identical rows
    stream = encode_jbig2_generic(bm, template=template, tpgdon=True)
    assert np.array_equal(decode_jbig2_embedded(stream), bm)
    # typical prediction must pay for itself on the repeated band
    plain = encode_jbig2_generic(bm, template=template, tpgdon=False)
    assert len(stream) < len(plain)


@pytest.mark.parametrize(
    "template,at",
    [
        (0, [(1, -1), (-2, -1), (1, -2), (-1, -2)]),
        (1, [(1, -1)]),
        (2, [(-3, -1)]),
        (3, [(-5, 0)]),
    ],
)
def test_generic_non_nominal_at_general_path(template, at):
    """Non-nominal AT pixels leave the fast row-window path: the general
    per-pixel gather must agree (AT bit positions are fixed per the spec
    figures; only the value source moves)."""
    bm = _doc_bitmap(40, 120, seed=11)
    stream = encode_jbig2_generic(bm, template=template, at=at)
    assert np.array_equal(decode_jbig2_embedded(stream), bm)


# ------------------------------------------------- symbol + text regions


def _glyphs():
    a = np.array([[0, 1, 0], [1, 0, 1], [1, 1, 1], [1, 0, 1]], np.uint8)
    b = np.array([[1, 1, 0], [1, 0, 1], [1, 1, 0], [1, 0, 1], [1, 1, 0]],
                 np.uint8)
    dot = np.array([[1]], np.uint8)
    return [a, b, dot]


def _compose(syms, placements, w, h):
    exp = np.zeros((h, w), np.uint8)
    for sid, x, y in placements:
        s = syms[sid]
        exp[y : y + s.shape[0], x : x + s.shape[1]] |= s
    return exp


@pytest.mark.parametrize("split_globals", [False, True])
def test_symbol_text_page_roundtrip(split_globals):
    """The jbig2enc output shape: symbol dictionary (optionally in the
    PDF /JBIG2Globals stream) + text region placing glyph instances."""
    syms = _glyphs()
    placements = [(0, 4, 3), (1, 10, 2), (2, 16, 5), (0, 20, 3),
                  (1, 30, 12), (2, 38, 18), (0, 2, 14), (1, 44, 2)]
    page, glob = encode_jbig2_text_page(syms, placements, 50, 24,
                                        split_globals=split_globals)
    out = decode_jbig2_embedded(page, glob)
    assert np.array_equal(out, _compose(syms, placements, 50, 24))


def test_symbol_text_single_symbol_zero_codelen():
    """SBSYMCODELEN = ceil(log2(1)) = 0: the IAID tree reads no bits."""
    dot = np.array([[1, 1], [1, 1]], np.uint8)
    placements = [(0, x, y) for x in (2, 6, 10) for y in (2, 6)]
    page, glob = encode_jbig2_text_page([dot], placements, 16, 10)
    out = decode_jbig2_embedded(page, glob)
    assert np.array_equal(out, _compose([dot], placements, 16, 10))


@pytest.mark.parametrize("refcorner", [0, 1, 2, 3])
@pytest.mark.parametrize("transposed", [False, True])
@pytest.mark.parametrize("dsoffset", [0, 3, -2])
def test_text_region_coordinate_paths(refcorner, transposed, dsoffset):
    """Every REFCORNER × TRANSPOSED × SBDSOFFSET combination maps back to
    the same top-left placements — pins the decoder's §6.4.5 coordinate
    arithmetic, not just the jbig2enc default path."""
    syms = _glyphs()[:2]
    placements = [(0, 4, 3), (1, 10, 2), (0, 20, 3), (1, 30, 12), (0, 2, 14)]
    page, glob = encode_jbig2_text_page(
        syms, placements, 40, 22, refcorner=refcorner,
        transposed=transposed, dsoffset=dsoffset,
    )
    out = decode_jbig2_embedded(page, glob)
    assert np.array_equal(out, _compose(syms, placements, 40, 22))


def test_text_region_xor_combop_on_overlap():
    """SBCOMBOP=XOR with overlapping instances — the compositing operator
    path beyond the OR default."""
    syms = _glyphs()[:2]
    placements = [(0, 4, 3), (1, 10, 2), (1, 11, 3)]  # last two overlap
    page, glob = encode_jbig2_text_page(syms, placements, 40, 22, combop=2)
    exp = np.zeros((22, 40), np.uint8)
    for sid, x, y in placements:
        s = syms[sid]
        exp[y : y + s.shape[0], x : x + s.shape[1]] ^= s
    assert np.array_equal(decode_jbig2_embedded(page, glob), exp)


def test_symbol_text_many_symbols_multiclass_heights():
    """Several height classes and a >2-bit symbol code, text-like reuse."""
    rng = np.random.default_rng(9)
    syms = [
        (rng.random((h, w)) < 0.5).astype(np.uint8)
        for h, w in [(3, 2), (3, 4), (4, 3), (4, 3), (5, 2), (5, 5), (6, 4)]
    ]
    placements = []
    x, y = 1, 1
    for i in range(40):
        sid = i % len(syms)
        placements.append((sid, x, y))
        x += syms[sid].shape[1] + 1
        if x > 70:
            x, y = 1, y + 8
    page, glob = encode_jbig2_text_page(syms, placements, 80, 60)
    out = decode_jbig2_embedded(page, glob)
    assert np.array_equal(out, _compose(syms, placements, 80, 60))


# ------------------------------------------------------- hostile inputs


def test_refused_features_raise_named_errors():
    bm = _doc_bitmap(20, 40)
    stream = bytearray(encode_jbig2_generic(bm))
    # segment 2 starts after the page-info segment (11-byte header + 19
    # bytes of body); flip its type byte (offset +4 into the header)
    seg2 = 11 + 19
    stream[seg2 + 4] = (stream[seg2 + 4] & 0xC0) | 22  # halftone region
    with pytest.raises(NotImplementedError, match="halftone"):
        decode_jbig2_embedded(bytes(stream))
    stream[seg2 + 4] = (stream[seg2 + 4] & 0xC0) | 36  # intermediate generic
    with pytest.raises(NotImplementedError, match="intermediate"):
        decode_jbig2_embedded(bytes(stream))


def test_truncated_and_overrun_segments_raise():
    bm = _doc_bitmap(20, 40)
    stream = encode_jbig2_generic(bm)
    with pytest.raises(ValueError):
        decode_jbig2_embedded(stream[: len(stream) // 2])
    # declared data length overruns the stream
    bad = bytearray(stream)
    bad[11 + 19 + 7 : 11 + 19 + 11] = (2**31).to_bytes(4, "big")
    with pytest.raises(ValueError, match="overruns"):
        decode_jbig2_embedded(bytes(bad))


def test_implausible_region_size_refused_before_allocation():
    """A hostile region header must be rejected before the allocation it
    implies (executor-OOM class)."""
    bm = np.zeros((8, 8), np.uint8)
    stream = bytearray(encode_jbig2_generic(bm))
    body = 11 + 19 + 11  # start of generic-region body (region info)
    stream[body : body + 4] = (1 << 24).to_bytes(4, "big")  # width
    stream[body + 4 : body + 8] = (1 << 24).to_bytes(4, "big")  # height
    with pytest.raises(ValueError, match="out of bounds"):
        decode_jbig2_embedded(bytes(stream))


def test_region_before_page_info_raises():
    bm = np.zeros((8, 8), np.uint8)
    stream = encode_jbig2_generic(bm)
    no_page = stream[11 + 19 :]  # drop the page-info segment
    with pytest.raises(ValueError, match="page information"):
        decode_jbig2_embedded(no_page)


def test_garbage_raises_not_hangs():
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jbig2_embedded(b"\x00" * 64)


def test_page_default_operator_override_rule():
    """T.88 §8.2: a region's own combination operator applies only when
    the page's override bit allows it; otherwise the page default (OR
    here) is used.  Page default pixel 1 + region op XOR makes the two
    cases observably different: OR keeps all-ones, XOR inverts."""
    bm = np.zeros((10, 24), np.uint8)
    bm[2:6, 4:20] = 1
    stream = bytearray(encode_jbig2_generic(bm))
    pflags_at = 11 + 16  # page-info header (11) + w/h/xres/yres (16)
    combop_at = 11 + 19 + 11 + 16  # page seg + region header + region w/h/x/y
    stream[pflags_at] |= 0x04  # page default pixel = 1
    stream[combop_at] = 2  # region claims XOR
    # override NOT allowed (bit 6 clear): page default op OR wins → all 1s
    out = decode_jbig2_embedded(bytes(stream))
    assert (out == 1).all()
    # override allowed: the region's XOR applies → page inverts the bitmap
    stream[pflags_at] |= 0x40
    out = decode_jbig2_embedded(bytes(stream))
    assert np.array_equal(out, 1 - bm)


# ---------------------------------------------------- PDF integration

from tableextraction_spark import pdfx  # noqa: E402
from tests.test_pdfx import _hand_pdf, _stream_obj  # noqa: E402


def _jbig2_pdf(bm, *, mask=False, decode_10=False, use_globals=False):
    h, w = bm.shape
    if use_globals:
        syms = _glyphs()
        placements = [(0, 4, 3), (1, 12, 2), (2, 20, 8), (0, 26, 3)]
        data, glob = encode_jbig2_text_page(syms, placements, w, h,
                                            split_globals=True)
    else:
        data, glob = encode_jbig2_generic(bm, template=0, tpgdon=True), b""
    parms = b"<< /JBIG2Globals 6 0 R >>" if use_globals else b"<< >>"
    d = (
        b"<< /Subtype /Image /Width %d /Height %d /BitsPerComponent 1 " % (w, h)
        + (b"/ImageMask true " if mask else b"/ColorSpace /DeviceGray ")
        + (b"/Decode [1 0] " if decode_10 else b"")
        + b"/Filter /JBIG2Decode /DecodeParms " + parms + b" >>"
    )
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] " % (w, h)
        + b"/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        _stream_obj(b"<< >>", b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)),
        _stream_obj(d, data),
    ]
    if use_globals:
        objs.append(_stream_obj(b"<< >>", glob))
    return _hand_pdf(*objs)


def test_pdf_jbig2_page_rasterizes_pixel_exact():
    bm = _doc_bitmap(60, 200)
    arr = pdfx.rasterize_pdf_page(_jbig2_pdf(bm))
    expected = np.where(bm == 1, 0, 255).astype(np.uint8)  # ink on white
    assert np.array_equal(arr, expected)


def test_pdf_jbig2_globals_symbol_text_page():
    """The real PDF arrangement: symbol dictionary in /JBIG2Globals,
    text region in the image stream."""
    bm = np.zeros((20, 40), np.uint8)  # shape carrier only
    arr = pdfx.rasterize_pdf_page(_jbig2_pdf(bm, use_globals=True))
    syms = _glyphs()
    placements = [(0, 4, 3), (1, 12, 2), (2, 20, 8), (0, 26, 3)]
    exp_bits = _compose(syms, placements, 40, 20)
    assert np.array_equal(arr, np.where(exp_bits == 1, 0, 255))


def test_pdf_jbig2_decode_10_inverts():
    bm = _doc_bitmap(30, 90)
    arr = pdfx.rasterize_pdf_page(_jbig2_pdf(bm, decode_10=True))
    assert np.array_equal(arr, np.where(bm == 1, 255, 0))


def test_pdf_jbig2_imagemask_stencil():
    bm = np.zeros((16, 32), np.uint8)
    bm[4:12, 8:24] = 1
    arr = pdfx.rasterize_pdf_page(_jbig2_pdf(bm, mask=True))
    assert (arr[4:12, 8:24] == 0).all()
    assert (arr[0:4, :] == 255).all()


def test_build_scanned_page_pdf_jbig2_codec():
    """The scanned-corpus fixture shape with the JBIG2 archive codecs
    (generic region, and symbol/text mode with /JBIG2Globals)."""
    img = np.full((80, 160), 255, np.uint8)
    img[10:16, 12:148] = 0
    img[40:41, 10:150] = 0
    for codec in ("jbig2", "jbig2sym"):
        pdf = pdfx.build_scanned_page_pdf(img, codec=codec)
        assert np.array_equal(pdfx.rasterize_pdf_page(pdf), img), codec


# ------------------------------------------------- symbol-mode encoder


def test_connected_components_shapes_and_diagonals():
    from tableextraction_spark.jbig2 import _connected_components

    bm = np.zeros((10, 12), np.uint8)
    bm[1:4, 1:4] = 1  # block
    bm[1, 6] = 1
    bm[2, 7] = 1  # diagonal pair: 8-connectivity makes it ONE component
    bm[8, 0:12] = 1  # full-width rule line
    comps = _connected_components(bm)
    assert [(x, y, g.shape) for x, y, g in comps] == [
        (1, 1, (3, 3)), (6, 1, (2, 2)), (0, 8, (1, 12)),
    ]
    # reconstruction: OR of glyphs at their positions = original
    rec = np.zeros_like(bm)
    for x, y, g in comps:
        rec[y : y + g.shape[0], x : x + g.shape[1]] |= g
    assert np.array_equal(rec, bm)


def test_connected_components_distance_two_stays_separate():
    """Pixels two columns apart on adjacent rows are NOT 8-connected —
    regression for an exclusive-run-end treated as inclusive, which
    over-merged glyphs separated by one blank column diagonally."""
    from tableextraction_spark.jbig2 import _connected_components

    bm = np.zeros((2, 6), np.uint8)
    bm[0, 1] = 1
    bm[1, 3] = 1  # dx=2 from (0,1): separate components
    assert len(_connected_components(bm)) == 2
    bm[1, 2] = 1  # now diagonal contact → one component
    assert len(_connected_components(bm)) == 1


def test_symbol_page_blank_honors_seg_base():
    """A blank page's generic-region fallback must carry the caller's
    seg_base so multi-page shared-globals streams keep unique segment
    numbers (regression: fallback pinned segments 1..3)."""
    from tableextraction_spark.jbig2 import _parse_segment_headers

    page, glob = encode_jbig2_symbol_page(
        np.zeros((8, 8), np.uint8), split_globals=True, seg_base=21
    )
    assert glob == b""
    nums = [n for n, *_ in _parse_segment_headers(page)]
    assert nums == [21, 22, 23]
    assert np.array_equal(
        decode_jbig2_embedded(page, glob), np.zeros((8, 8), np.uint8)
    )


@pytest.mark.parametrize("split_globals", [False, True])
def test_symbol_page_lossless_reconstruction(split_globals):
    """Symbol-mode encoding of an arbitrary page is LOSSLESS: every ink
    component becomes a (deduplicated) dictionary symbol."""
    bm = _doc_bitmap(90, 260, seed=13)
    p, g = encode_jbig2_symbol_page(bm, split_globals=split_globals)
    assert np.array_equal(decode_jbig2_embedded(p, g), bm)


def test_symbol_page_dedupes_repeated_glyphs():
    """Identical components share one dictionary entry — the whole point
    of symbol mode (glyph decoded once, placements cheap)."""
    glyph = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], np.uint8)
    bm = np.zeros((30, 120), np.uint8)
    for r in (2, 12, 22):
        for c in range(2, 110, 6):
            bm[r : r + 3, c : c + 3] = glyph
    p_rep, g_rep = encode_jbig2_symbol_page(bm)
    # a same-ink page of all-DISTINCT glyphs must encode much larger
    rng = np.random.default_rng(5)
    bm2 = np.zeros_like(bm)
    for r in (2, 12, 22):
        for c in range(2, 110, 6):
            bm2[r : r + 3, c : c + 3] = rng.integers(0, 2, (3, 3))
    p_dis, g_dis = encode_jbig2_symbol_page(bm2)
    assert np.array_equal(decode_jbig2_embedded(p_rep, g_rep), bm)
    assert np.array_equal(decode_jbig2_embedded(p_dis, g_dis), bm2)
    assert len(p_rep) + len(g_rep) < (len(p_dis) + len(g_dis)) / 2


def test_symbol_page_edge_cases():
    blank = np.zeros((20, 30), np.uint8)
    p, g = encode_jbig2_symbol_page(blank)
    assert np.array_equal(decode_jbig2_embedded(p, g), blank)
    solid = np.ones((15, 25), np.uint8)
    p, g = encode_jbig2_symbol_page(solid)
    assert decode_jbig2_embedded(p, g).all()
    one_px = np.zeros((5, 5), np.uint8)
    one_px[2, 3] = 1
    p, g = encode_jbig2_symbol_page(one_px)
    assert np.array_equal(decode_jbig2_embedded(p, g), one_px)


def test_probe_standalone_jbig2_file():
    """Standalone .jb2 files (T.88 Annex D.1 file header) inventory with
    page count and first-page dimensions, header-only."""
    from tableextraction_spark.probe import probe_bytes

    bm = np.zeros((20, 30), np.uint8)
    bm[5:10, 5:20] = 1
    emb = encode_jbig2_generic(bm)
    for hdr in (
        b"\x97JB2\r\n\x1a\n" + bytes([0]) + (1).to_bytes(4, "big"),  # known
        b"\x97JB2\r\n\x1a\n" + bytes([2]),  # unknown page count
    ):
        out = probe_bytes(hdr + emb)
        assert out["format"] == "jbig2" and out["kind"] == "image"
        assert out["n_frames"] == 1
        assert out["width"] == 30 and out["height"] == 20
    assert probe_bytes(b"\x97JB2\r\n\x1a\n\x02\x00")["codec"] == "malformed"


def test_mq_flush_edge_cases():
    """Regression for two flush bugs that misdecoded the FINAL symbols of
    an MQ stream: (1) a fully-formed byte pending at flush (the deferred
    RENORME byteout) was corrupted by SETBITS; (2) SETBITS zero-filled
    the low bits, so the decoder's 1-feed for untransmitted bits could
    overshoot the [C, C+A) interval top.  Exercises random context/bit
    sequences over JPEG-2000-style initial states (state 46 uniform,
    state 3 run), which reach both edges quickly."""
    import numpy as np

    from tableextraction_spark.jbig2 import _Ctx, _MQDecoder, _MQEncoder

    def mkctx():
        cx = _Ctx(19)
        cx.idx[0] = 4
        cx.idx[17] = 3
        cx.idx[18] = 46
        return cx

    rng = np.random.default_rng(99)
    for trial in range(400):
        n = int(rng.integers(1, 3000))
        seq = [(int(rng.integers(0, 19)), int(rng.integers(0, 2)))
               for _ in range(n)]
        enc = _MQEncoder()
        ce = mkctx()
        for ctx, bit in seq:
            enc.encode(ce, ctx, bit)
        data = enc.flush()
        dec = _MQDecoder(data)
        cd = mkctx()
        for i, (ctx, bit) in enumerate(seq):
            assert dec.decode(cd, ctx) == bit, (trial, i, n)

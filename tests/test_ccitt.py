"""CCITT G3/G4 codec (ITU-T T.4/T.6): exact round-trips through every
coding mode, spec-canonical code vectors, hostile-input bounds, and the
PDF CCITTFaxDecode integration (BlackIs1 both ways, EncodedByteAlign,
ImageMask stencils, pixel-exact page rasterization)."""

import numpy as np
import pytest

from tableextraction_spark.ccitt import (
    _EOL,
    _Writer,
    decode_ccitt,
    encode_ccitt_g3_1d,
    encode_ccitt_g4,
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


@pytest.mark.parametrize("bm", CASES, ids=["white", "black", "doc", "noise"])
def test_g4_roundtrip_exact(bm):
    out = decode_ccitt(encode_ccitt_g4(bm), columns=bm.shape[1],
                       rows=bm.shape[0], k=-1)
    assert np.array_equal(out, bm)


@pytest.mark.parametrize("bm", CASES, ids=["white", "black", "doc", "noise"])
def test_g3_1d_roundtrip_exact(bm):
    out = decode_ccitt(encode_ccitt_g3_1d(bm), columns=bm.shape[1],
                       rows=bm.shape[0], k=0)
    assert np.array_equal(out, bm)


def test_g3_1d_with_eol_and_byte_align():
    bm = _doc_bitmap(40, 120)
    data = encode_ccitt_g3_1d(bm, with_eol=True, byte_align=True)
    out = decode_ccitt(data, columns=120, rows=40, k=0, byte_align=True)
    assert np.array_equal(out, bm)


def test_g3_mixed_k_positive():
    """K>0: every row is EOL + tag bit, 1D and 2D rows interleaved —
    hand-built stream exercising the mixed decoder."""
    from tableextraction_spark.ccitt import _decode_row_2d  # noqa: F401

    bm = _doc_bitmap(24, 96, seed=5)
    wr = _Writer()
    ref_trans = []
    for y in range(bm.shape[0]):
        row = bm[y]
        trans = (
            np.flatnonzero(np.diff(np.concatenate([[0], row.astype(np.int8)])))
            .tolist()
        )
        wr.put(_EOL)
        if y % 2 == 0:  # 1D row
            wr.put("1")
            prev, black = 0, False
            for t in trans + [96]:
                wr.put_run(t - prev, black)
                prev, black = t, not black
            if prev < 96:
                wr.put_run(96 - prev, black)
        else:  # 2D row coded against the previous row
            wr.put("0")
            # encode with the same mode selection as encode_ccitt_g4
            ref, cur = ref_trans, trans
            a0, black, i = -1, False, 0
            while a0 < 96:
                a1 = cur[i] if i < len(cur) else 96
                j = 0 if not black else 1
                while j < len(ref) and ref[j] <= (a0 if a0 >= 0 else -1):
                    j += 2
                b1 = ref[j] if j < len(ref) else 96
                b2 = ref[j + 1] if j + 1 < len(ref) else 96
                if b2 < a1:
                    wr.put("0001")
                    a0 = b2
                elif abs(a1 - b1) <= 3:
                    wr.put({0: "1", 1: "011", 2: "000011", 3: "0000011",
                            -1: "010", -2: "000010", -3: "0000010"}[a1 - b1])
                    a0, black, i = a1, not black, i + 1
                else:
                    s = a0 if a0 >= 0 else 0
                    a2 = cur[i + 1] if i + 1 < len(cur) else 96
                    wr.put("001")
                    wr.put_run(a1 - s, black)
                    wr.put_run(a2 - a1, not black)
                    a0, i = a2, i + 2
        ref_trans = trans
    out = decode_ccitt(wr.tobytes(), columns=96, rows=24, k=1)
    assert np.array_equal(out, bm)


def test_canonical_spec_vectors():
    """Pin the tables against T.4's published encodings — catches table
    transcription typos that a same-table round-trip cannot."""
    w = _Writer(); w.put_run(1728, False)
    assert "".join(w.bits) == "010011011" + "00110101"  # makeup 1728 + white 0
    w = _Writer(); w.put_run(0, True)
    assert "".join(w.bits) == "0000110111"  # black 0
    w = _Writer(); w.put_run(2560 + 63, True)
    assert "".join(w.bits) == "000000011111" + "000001100111"  # ext 2560 + black 63
    # one-pixel checkerboard row: white0 black1 alternating
    bm = np.zeros((1, 4), np.uint8); bm[0, ::2] = 1
    data = encode_ccitt_g3_1d(bm)
    # white 0, black 1, white 1, black 1, white 1  (row: 1 0 1 0)
    assert decode_ccitt(data, columns=4, rows=1, k=0)[0].tolist() == [1, 0, 1, 0]


def test_truncated_and_garbage_raise_named_errors():
    bm = _doc_bitmap(16, 64)
    good = encode_ccitt_g4(bm)
    with pytest.raises(ValueError, match="CCITT"):
        decode_ccitt(good[: len(good) // 3], columns=64, rows=16, k=-1)
    # 00000001… is the T.6 extension escape — not in the mode LUT
    with pytest.raises(ValueError, match="CCITT"):
        decode_ccitt(b"\x01\xff" * 25, columns=64, rows=16, k=-1)
    with pytest.raises(ValueError):
        decode_ccitt(good, columns=0, rows=16, k=-1)


def test_g4_eofb_terminates_short_rows_param():
    """rows=0: EOFB (EOL EOL) ends the image — the decoder must not read
    past it into the padding."""
    bm = _doc_bitmap(10, 64)
    out = decode_ccitt(encode_ccitt_g4(bm, with_eofb=True), columns=64,
                       rows=0, k=-1)
    assert np.array_equal(out, bm)


# ---- PDF integration ----------------------------------------------------

from tableextraction_spark import pdfx  # noqa: E402
from tests.test_pdfx import _hand_pdf, _stream_obj  # noqa: E402


def _ccitt_pdf(bm, *, black_is_1: bool, k: int = -1, byte_align: bool = False,
               mask: bool = False):
    h, w = bm.shape
    if k < 0:
        data = encode_ccitt_g4(bm)
    else:
        data = encode_ccitt_g3_1d(bm, with_eol=False, byte_align=byte_align)
    parms = (
        b"<< /K %d /Columns %d /Rows %d /BlackIs1 %s /EncodedByteAlign %s >>"
        % (k, w, h, b"true" if black_is_1 else b"false",
           b"true" if byte_align else b"false")
    )
    d = (
        b"<< /Subtype /Image /Width %d /Height %d /BitsPerComponent 1 " % (w, h)
        + (b"/ImageMask true " if mask else b"/ColorSpace /DeviceGray ")
        # BlackIs1 makes ink = sample 1; real writers pair it with
        # /Decode [1 0] so sample 1 still renders black (ISO 32000-1)
        + (b"/Decode [1 0] " if black_is_1 and not mask else b"")
        + b"/Filter /CCITTFaxDecode /DecodeParms " + parms + b" >>"
    )
    return _hand_pdf(
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] " % (w, h)
        + b"/Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>",
        _stream_obj(b"<< >>", b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)),
        _stream_obj(d, data),
    )


@pytest.mark.parametrize("black_is_1", [False, True])
@pytest.mark.parametrize("k", [-1, 0])
def test_pdf_ccitt_page_rasterizes_pixel_exact(black_is_1, k):
    """The r3 verdict's 'Done =' bar: CCITT fixtures (G4 + G3, BlackIs1
    both ways) rasterize pixel-exact through the PDF lane."""
    bm = _doc_bitmap(60, 200)
    arr = pdfx.rasterize_pdf_page(_ccitt_pdf(bm, black_is_1=black_is_1, k=k))
    assert arr.shape == bm.shape
    expected = np.where(bm == 1, 0, 255).astype(np.uint8)  # ink black on white
    assert np.array_equal(arr, expected)


def test_pdf_ccitt_byte_aligned_g3():
    bm = _doc_bitmap(30, 88)
    arr = pdfx.rasterize_pdf_page(
        _ccitt_pdf(bm, black_is_1=False, k=0, byte_align=True)
    )
    assert np.array_equal(arr, np.where(bm == 1, 0, 255).astype(np.uint8))


def test_pdf_ccitt_imagemask_stencil():
    """CCITT data as an ImageMask stencil: ink paints the fill color only
    where the (sample-convention) bit is 0."""
    bm = np.zeros((16, 32), np.uint8)
    bm[4:12, 8:24] = 1
    arr = pdfx.rasterize_pdf_page(_ccitt_pdf(bm, black_is_1=False, mask=True))
    assert (arr[4:12, 8:24] == 0).all()
    assert (arr[0:4, :] == 255).all()


@pytest.mark.parametrize("with_eol", [False, True])
def test_g3_byte_align_wide_rows_exact(with_eol):
    """Review regression: pad zeros + a long white makeup code's leading
    zeros could reach 11 and be consumed as a fake EOL, silently
    corrupting aligned K=0 streams (e.g. width 1900, first white run
    1800).  EOL usage is now decided once per stream."""
    rng = np.random.default_rng(11)
    wide = np.zeros((9, 1900), np.uint8)
    wide[:, 1800:1850] = 1  # rows open with a 1800-pixel white run
    cases = [wide, (rng.random((16, 157)) < 0.5).astype(np.uint8),
             (rng.random((12, 118)) < 0.2).astype(np.uint8)]
    for bm in cases:
        data = encode_ccitt_g3_1d(bm, with_eol=with_eol, byte_align=True)
        out = decode_ccitt(data, columns=bm.shape[1], rows=bm.shape[0],
                           k=0, byte_align=True)
        assert np.array_equal(out, bm)


def test_reader_window_memory_is_bounded():
    """Review regression: the bit reader materialized ~36 B of heap per
    input BIT for the whole stream — a multi-GB allocation for an
    attacker-sized stream.  Chunks are now bounded, and a stream larger
    than one chunk still decodes exactly."""
    from tableextraction_spark.ccitt import _WIN_CHUNK, _Reader

    rng = np.random.default_rng(2)
    bm = (rng.random((420, 2400)) < 0.5).astype(np.uint8)  # ~large stream
    data = encode_ccitt_g4(bm)
    assert len(data) * 8 > _WIN_CHUNK  # stream really exceeds one chunk
    rd = _Reader(data)
    assert len(rd._chunk) <= _WIN_CHUNK
    out = decode_ccitt(data, columns=2400, rows=420, k=-1)
    assert np.array_equal(out, bm)
    big = _Reader(b"\x00" * (8 << 20))  # 8 MB hostile stream: bounded alloc
    assert len(big._chunk) <= _WIN_CHUNK

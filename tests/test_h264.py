"""H.264 (ITU-T | ISO 14496-10) structural layer + I_PCM payload tests.

Exp-Golomb is pinned to the spec's §9.1 table values; emulation prevention
round-trips hostile byte patterns; frame round trips go through both the
Annex-B elementary stream and the MP4 avc1 (avcC) path; CAVLC/CABAC/
deblocking raise their NAMED seams.
"""

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from tableextraction_spark.h264 import (
    _BitReader,
    _BitWriter,
    decode_h264_annexb,
    encode_h264_annexb,
    insert_emulation_prevention,
    iter_annexb_nals,
    parse_pps,
    parse_sps,
    strip_emulation_prevention,
)


def _frames(n, h, w, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w)).astype(np.uint8) for _ in range(n)]


# ------------------------------------------------------------ primitives

def test_exp_golomb_spec_values():
    """§9.1 Table 9-1: codeNum ↔ bit strings; §9.1.1 Table 9-3: se(v)."""
    bits = {0: "1", 1: "010", 2: "011", 3: "00100", 4: "00101",
            5: "00110", 6: "00111", 7: "0001000", 8: "0001001"}
    for v, s in bits.items():
        w = _BitWriter()
        w.ue(v)
        # exact bit string: tobytes zero-pads the tail, so the first
        # len(s) bits of the padded bytes must spell the spec codeword
        got = "".join(f"{b:08b}" for b in w.tobytes())[: len(s)]
        assert got == s
        r = _BitReader(w.tobytes())
        assert r.ue() == v
    # se mapping: codeNum 0,1,2,3,4 → 0, 1, -1, 2, -2
    for v in (0, 1, -1, 2, -2, 7, -7, 100, -100):
        w = _BitWriter()
        w.se(v)
        assert _BitReader(w.tobytes()).se() == v


def test_bitrw_roundtrip_mixed():
    w = _BitWriter()
    vals = [(3, 5), (0, 1), (1, 1), (255, 8), (1023, 10)]
    for v, n in vals:
        w.u(v, n)
    r = _BitReader(w.tobytes())
    assert [r.u(n) for _v, n in vals] == [v for v, _n in vals]


def test_truncated_bitstream_raises():
    r = _BitReader(b"\x00")
    with pytest.raises(ValueError, match="truncated"):
        r.ue()  # 8 zero bits, no terminating 1


def test_emulation_prevention_roundtrip():
    hostile = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x02",
        b"\x00\x00\x02",
        b"\x00\x00\x03\x00\x00\x01",
        b"\x7f\x00\x00\x00\x00\x00\x01",
        bytes(range(256)) + b"\x00\x00\x01",
    ]
    for rbsp in hostile:
        nal = insert_emulation_prevention(rbsp)
        # no start-code-able pattern survives inside the NAL payload
        for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
            assert bad not in nal
        assert strip_emulation_prevention(nal) == rbsp


# ----------------------------------------------------------- round trips

@pytest.mark.parametrize("h,w", [(32, 48), (33, 47), (16, 16), (70, 90)])
def test_annexb_roundtrip_pixel_exact(h, w):
    """Even dims → Baseline 4:2:0; odd dims → High 4:0:0 monochrome
    (1×1 crop units represent any size exactly).  Both pixel-exact."""
    frames = _frames(3, h, w)
    buf = encode_h264_annexb(frames)
    got = decode_h264_annexb(buf)
    assert len(got) == 3
    for a, b in zip(got, frames):
        assert a.shape == (h, w) and np.array_equal(a, b)


def test_annexb_profile_selection():
    even = encode_h264_annexb(_frames(1, 32, 32))
    odd = encode_h264_annexb(_frames(1, 31, 31))
    sps_even = next(r for _i, t, r in iter_annexb_nals(even) if t == 7)
    sps_odd = next(r for _i, t, r in iter_annexb_nals(odd) if t == 7)
    assert parse_sps(sps_even)["profile"] == 66  # Baseline, 4:2:0
    assert parse_sps(sps_odd)["chroma_format_idc"] == 0  # monochrome


def test_mp4_avc1_roundtrip_and_routing():
    from tableextraction_spark.mp4 import encode_mp4_h264
    from tableextraction_spark.multimodal import iter_video_frames

    frames = _frames(5, 33, 50, seed=9)
    mp4 = encode_mp4_h264(frames, fps=4)
    got = list(iter_video_frames(mp4))
    assert [i for i, _n, _f in got] == list(range(5))
    assert all(n == 5 for _i, n, _f in got)
    for (_i, _n, a), b in zip(got, frames):
        assert np.array_equal(a, b)


def test_raw_annexb_routes_through_multimodal():
    from tableextraction_spark.multimodal import decode_video

    frames = _frames(2, 24, 24, seed=5)
    got = decode_video(encode_h264_annexb(frames))
    assert len(got) == 2 and np.array_equal(got[0], frames[0])


# --------------------------------------------------------- named refusals

def test_cabac_pps_named_refusal():
    w = _BitWriter()
    w.ue(0)  # pps_id
    w.ue(0)  # sps_id
    w.u(1, 1)  # entropy_coding_mode = CABAC
    w.u(0, 1)
    w.ue(0)
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="CABAC"):
        parse_pps(w.tobytes())


def test_cavlc_macroblock_named_refusal():
    """An I-slice macroblock with any CAVLC-coded type (mb_type != 25)
    names the coeff_token-table seam instead of decoding garbage."""
    buf = bytearray(encode_h264_annexb(_frames(1, 16, 16)))
    # locate the IDR slice NAL and rewrite its first mb_type (ue(25) =
    # 00010 1010) to ue(0) = '1' by re-encoding the slice prefix
    from tableextraction_spark.h264 import _nal

    w = _BitWriter()
    w.ue(0)   # first_mb_in_slice
    w.ue(7)   # slice_type I
    w.ue(0)   # pps_id
    w.u(0, 4)  # frame_num
    w.ue(0)   # idr_pic_id
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)   # slice_qp_delta
    w.ue(1)   # disable deblocking
    w.ue(0)   # mb_type I_4x4 ← the CAVLC-coded shape
    w.rbsp_trailing()
    sc = b"\x00\x00\x00\x01"
    pieces = encode_h264_annexb(_frames(1, 16, 16)).split(sc)
    stream = sc + pieces[1] + sc + pieces[2] + sc + _nal(3, 5, w.tobytes())
    with pytest.raises(NotImplementedError, match="I_PCM|CAVLC|coeff"):
        decode_h264_annexb(stream)


def test_deblocking_enabled_named_refusal():
    from tableextraction_spark.h264 import _nal

    w = _BitWriter()
    w.ue(0)
    w.ue(7)
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(0)   # disable_deblocking_filter_idc = 0 (filter ON)
    w.se(0)   # alpha offset
    w.se(0)   # beta offset
    w.rbsp_trailing()
    sc = b"\x00\x00\x00\x01"
    pieces = encode_h264_annexb(_frames(1, 16, 16)).split(sc)
    stream = sc + pieces[1] + sc + pieces[2] + sc + _nal(3, 5, w.tobytes())
    with pytest.raises(NotImplementedError, match="deblocking"):
        decode_h264_annexb(stream)


def test_truncated_pcm_payload_is_value_error():
    buf = encode_h264_annexb(_frames(1, 32, 32))
    with pytest.raises(ValueError):
        decode_h264_annexb(buf[: len(buf) - 40])


def test_garbage_is_value_error():
    with pytest.raises(ValueError, match="start code"):
        decode_h264_annexb(b"not a video at all")


def test_incomplete_picture_refuses():
    """A stream whose slice covers only half the macroblocks must refuse
    (undecoded macroblocks), not emit a half-black frame silently."""
    frames = _frames(1, 32, 32)
    full = encode_h264_annexb(frames)
    from tableextraction_spark.h264 import (
        _build_pps,
        _build_sps,
        _nal,
    )

    w = _BitWriter()
    w.ue(0)
    w.ue(7)
    w.ue(0)
    w.u(0, 4)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)
    # exactly ONE I_PCM macroblock of the four
    w.ue(25)
    w.align_zero()
    w.raw_bytes(bytes(256))
    w.raw_bytes(b"\x80" * 128)
    w.rbsp_trailing()
    sc = b"\x00\x00\x00\x01"
    stream = (sc + _nal(3, 7, _build_sps(32, 32, False))
              + sc + _nal(3, 8, _build_pps())
              + sc + _nal(3, 5, w.tobytes()))
    with pytest.raises(ValueError, match="undecoded"):
        decode_h264_annexb(stream)


def test_cavlc_after_pcm_run_still_refuses():
    """The bulk I_PCM run decoder must stop at the first header byte-pair
    that isn't the fixed 0x0D 0x00 pattern and fall back to the exact
    scalar parse — a CAVLC macroblock hiding BEHIND a run of I_PCM ones
    still names the seam."""
    from tableextraction_spark.h264 import _build_pps, _build_sps, _nal

    w = _BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    for _ in range(3):  # three good I_PCM macroblocks (48x16 → 3 of 3…)
        w.ue(25)
        w.align_zero()
        w.raw_bytes(bytes(256))
        w.raw_bytes(b"\x80" * 128)
    w.ue(0)  # …then a CAVLC-coded I_4x4 where a 4th would overflow anyway
    w.rbsp_trailing()
    sc = b"\x00\x00\x00\x01"
    stream = (sc + _nal(3, 7, _build_sps(64, 16, False))
              + sc + _nal(3, 8, _build_pps())
              + sc + _nal(3, 5, w.tobytes()))
    with pytest.raises(NotImplementedError, match="I_PCM|CAVLC|coeff"):
        decode_h264_annexb(stream)


def _ep_strip_scalar(data: bytes) -> bytes:
    out, zeros = bytearray(), 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ep_insert_scalar(rbsp: bytes) -> bytes:
    out, zeros = bytearray(), 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


@given(
    st.lists(
        st.sampled_from([0, 0, 0, 1, 2, 3, 3, 4, 0x80, 0xFF]), max_size=400
    ).map(bytes)
)
def test_emulation_prevention_regex_matches_scalar_reference(data):
    """The C-speed regex strip/insert must agree byte-for-byte with the
    literal §7.4.1 zeros-counter algorithm on zero/low-byte-dense input —
    the adversarial density for emulation prevention."""
    from tableextraction_spark.h264 import (
        insert_emulation_prevention,
        strip_emulation_prevention,
    )

    assert strip_emulation_prevention(data) == _ep_strip_scalar(data)
    assert insert_emulation_prevention(data) == _ep_insert_scalar(data)
    # and the pair round-trips
    assert strip_emulation_prevention(
        insert_emulation_prevention(data)
    ) == data


# ------------------------------------------- review-pass regression pins

def test_slice_header_poc_fields_consumed():
    """A conformant stream whose PPS sets
    bottom_field_pic_order_in_frame_present_flag carries an se(v)
    delta_pic_order_cnt_bottom in every slice header — the reader must
    consume it or every later field shifts (r5 review finding 2)."""
    from tableextraction_spark.h264 import _nal

    # hand-build an SPS with poc_type 0 (the encoder emits poc_type 2,
    # which carries no slice-header POC fields at all)
    s = _BitWriter()
    s.u(66, 8)  # Baseline
    s.u(0, 8)
    s.u(30, 8)
    s.ue(0)   # sps_id
    s.ue(0)   # log2_max_frame_num_minus4
    s.ue(0)   # pic_order_cnt_type = 0
    s.ue(0)   # log2_max_pic_order_cnt_lsb_minus4 → 4 bits of poc_lsb
    s.ue(0)   # max_num_ref_frames
    s.u(0, 1)  # gaps_in_frame_num
    s.ue(0); s.ue(0)  # 1×1 macroblock grid (16×16)
    s.u(1, 1)  # frame_mbs_only
    s.u(1, 1)  # direct_8x8_inference
    s.u(0, 1)  # no cropping
    s.rbsp_trailing()
    # hand-build a PPS with the flag ON (encoder writes it off)
    p = _BitWriter()
    p.ue(0)   # pps_id
    p.ue(0)   # sps_id
    p.u(0, 1)  # CAVLC
    p.u(1, 1)  # bottom_field_pic_order_in_frame_present_flag = 1
    p.ue(0)   # num_slice_groups_minus1
    p.ue(0); p.ue(0); p.u(0, 1); p.u(0, 2)
    p.se(0)   # pic_init_qp
    p.se(0); p.se(0)
    p.u(1, 1)  # deblocking_filter_control_present
    p.u(0, 1); p.u(0, 1)
    p.rbsp_trailing()
    frame = np.arange(256, dtype=np.uint8).reshape(16, 16)
    w = _BitWriter()
    w.ue(0); w.ue(7); w.ue(0)  # first_mb, I, pps_id
    w.u(0, 4)  # frame_num
    w.ue(0)   # idr_pic_id
    w.u(0, 4)  # pic_order_cnt_lsb (log2_max_poc_lsb = 4)
    w.se(3)   # delta_pic_order_cnt_bottom ← the field under test
    w.u(0, 1); w.u(0, 1)  # dec_ref_pic_marking (IDR)
    w.se(0)   # slice_qp_delta
    w.ue(1)   # disable deblocking
    w.ue(25)  # I_PCM
    w.align_zero()
    w.raw_bytes(frame.tobytes())
    w.raw_bytes(b"\x80" * 128)
    w.rbsp_trailing()
    sc = b"\x00\x00\x00\x01"
    stream = (sc + _nal(3, 7, s.tobytes())
              + sc + _nal(3, 8, p.tobytes())
              + sc + _nal(3, 5, w.tobytes()))
    got = decode_h264_annexb(stream)
    assert len(got) == 1 and np.array_equal(got[0], frame)


def test_redundant_slice_named_refusal():
    from tableextraction_spark.h264 import _build_sps, _nal

    p = _BitWriter()
    p.ue(0); p.ue(0); p.u(0, 1); p.u(0, 1)
    p.ue(0); p.ue(0); p.ue(0); p.u(0, 1); p.u(0, 2)
    p.se(0); p.se(0); p.se(0)
    p.u(1, 1); p.u(0, 1)
    p.u(1, 1)  # redundant_pic_cnt_present_flag = 1
    p.rbsp_trailing()
    w = _BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    # (encoder SPS is poc_type 2 → no POC slice-header fields)
    w.ue(1)   # redundant_pic_cnt = 1 ← a redundant copy
    w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    w.ue(25); w.align_zero()
    w.raw_bytes(bytes(256)); w.raw_bytes(b"\x80" * 128)
    w.rbsp_trailing()
    sc = b"\x00\x00\x00\x01"
    stream = (sc + _nal(3, 7, _build_sps(16, 16, False))
              + sc + _nal(3, 8, p.tobytes())
              + sc + _nal(3, 5, w.tobytes()))
    with pytest.raises(NotImplementedError, match="redundant"):
        decode_h264_annexb(stream)


def test_avc3_in_band_parameter_sets_decode():
    """avc3's defining shape: avcC with NO SPS/PPS, parameter sets as
    NAL 7/8 inside the sync sample (r5 review finding 3)."""
    from tableextraction_spark.h264 import (
        _build_idr_slice,
        _build_pps,
        _build_sps,
        _nal,
        decode_avcc_sample,
    )

    frame = _frames(1, 32, 48, seed=11)[0]
    nals = [
        _nal(3, 7, _build_sps(48, 32, False)),
        _nal(3, 8, _build_pps()),
        _nal(3, 5, _build_idr_slice(frame, 3, 2, False)),
    ]
    sample = b"".join(len(n).to_bytes(4, "big") + n for n in nals)
    sps_by_id, pps_by_id = {}, {}
    got = decode_avcc_sample(sample, sps_by_id, pps_by_id, 4)
    assert np.array_equal(got, frame)
    assert 0 in sps_by_id and 0 in pps_by_id  # later samples inherit
    # and a PARAM-FREE follow-up sample decodes using the inherited sets
    sample2 = (len(nals[2]).to_bytes(4, "big") + nals[2])
    assert np.array_equal(
        decode_avcc_sample(sample2, sps_by_id, pps_by_id, 4), frame
    )


def test_annexb_frames_stream_lazily_with_upfront_count():
    from tableextraction_spark.h264 import (
        count_annexb_pictures,
        iter_h264_annexb_frames,
    )

    frames = _frames(4, 32, 32, seed=2)
    buf = encode_h264_annexb(frames)
    assert count_annexb_pictures(buf) == 4  # header-only scan
    it = iter_h264_annexb_frames(buf)
    first = next(it)  # yields without materializing the rest
    assert np.array_equal(first, frames[0])
    assert sum(1 for _ in it) == 3


def test_encode_mp4_h264_rejects_mixed_shapes():
    from tableextraction_spark.mp4 import encode_mp4_h264

    with pytest.raises(ValueError, match="one uint8"):
        encode_mp4_h264([np.zeros((32, 48), np.uint8),
                         np.zeros((16, 16), np.uint8)])
    with pytest.raises(ValueError, match="≥1 frame"):
        encode_mp4_h264([])


def test_router_accepts_aud_and_low_ref_idc_streams():
    """Conformant streams may open with an access-unit delimiter (NAL 9,
    common ffmpeg output) or an SPS with nal_ref_idc=1 — the router must
    sniff the start code + NAL header, not one literal byte (r5 review
    finding 6)."""
    from tableextraction_spark.multimodal import iter_video_frames

    frames = _frames(2, 16, 16, seed=7)
    base = encode_h264_annexb(frames)
    sc = b"\x00\x00\x00\x01"
    aud = sc + bytes([0x09, 0xF0])  # AUD, primary_pic_type I
    got = [f for _i, _n, f in iter_video_frames(aud + base)]
    assert len(got) == 2 and np.array_equal(got[0], frames[0])
    # SPS with ref_idc 1 (header byte 0x27), 3-byte start code form
    swapped = b"\x00\x00\x01" + bytes([0x27]) + base[5:]
    got2 = [f for _i, _n, f in iter_video_frames(swapped)]
    assert len(got2) == 2


def test_multi_entry_stsd_bounds_first_entry():
    """_stsd_entry must size the FIRST sample entry from its own u32
    size field, not span the whole stsd (r5 review finding 1)."""
    from tableextraction_spark.mp4 import _box, _fbox, _stsd_entry, _U32B

    entry1 = _box(b"jpeg", b"A" * 20)
    entry2 = _box(b"avc1", b"B" * 30)
    stsd = _fbox(b"stsd", 0, 0, _U32B.pack(2) + entry1 + entry2)
    buf = _box(b"stbl", stsd)
    fourcc, body_start, body_end = _stsd_entry(buf, (8, len(buf)))
    assert fourcc == b"jpeg"
    # the body must end exactly at entry1's boundary — entry2 excluded
    assert buf[body_start:body_end] == b"A" * 20

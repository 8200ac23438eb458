"""Ogg container + Vorbis I codec tests.

Bitstream primitives are pinned to the spec's own worked examples
(Huffman assignment §3.2.1), the FFT IMDCT is pinned to the literal
cosine formula, window shapes are pinned by the Princen-Bradley perfect-
reconstruction property across mixed short/long transitions, and the
end-to-end gate compares decoder PCM against ``expected_synthesis`` —
an oracle that shares NO decoder code (direct-formula IMDCT + plain
overlap-add of the same quantized spectrum), so a bitstream bug on either
side cannot cancel out.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tableextraction_spark.ogg import (
    OggWriter,
    iter_ogg_packets,
    last_granule,
    ogg_crc,
)
from tableextraction_spark.vorbis import (
    Codebook,
    OverlapAdder,
    assign_codewords,
    decode_ogg_vorbis,
    encode_vorbis_ogg,
    expected_synthesis,
    float32_pack,
    float32_unpack,
    ilog,
    imdct,
    imdct_direct,
    lookup1_values,
    vorbis_window,
)


def make_pcm(n: int, seed: int = 7, amp: int = 2048) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(-amp, amp, n).astype(np.int16)


def to_int16(x: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)


# ------------------------------------------------------------ primitives

def test_ilog_spec_values():
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7, -1)] == [0, 1, 2, 2, 3, 3, 0]


def test_huffman_assignment_matches_spec_worked_example():
    # Vorbis I spec §3.2.1 example: lengths [2,4,4,4,4,2,3,3]
    cw = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    want = {
        0: (0b00, 2),
        1: (0b0100, 4),
        2: (0b0101, 4),
        3: (0b0110, 4),
        4: (0b0111, 4),
        5: (0b10, 2),
        6: (0b110, 3),
        7: (0b111, 3),
    }
    assert cw == want


def test_huffman_underpopulated_rejected():
    with pytest.raises(ValueError, match="under-populated"):
        assign_codewords([2, 2, 2])  # 3/4 of the tree used


def test_huffman_overpopulated_rejected():
    with pytest.raises(ValueError, match="over-populated"):
        assign_codewords([1, 1, 1])


def test_float32_pack_unpack_roundtrip():
    for v in (0.0, 1.0, -1.0, 0.125, -8.0, 1.0 / 256.0, 768.5):
        assert float32_unpack(float32_pack(v)) == v


def test_lookup1_values():
    assert lookup1_values(9, 2) == 3
    assert lookup1_values(10, 2) == 3
    assert lookup1_values(16, 2) == 4
    assert lookup1_values(27, 3) == 3
    assert lookup1_values(26, 3) == 2


@pytest.mark.parametrize("n", [128, 256, 2048])
def test_imdct_fft_matches_direct_formula(n):
    x = np.random.default_rng(n).standard_normal(n // 2)
    assert np.abs(imdct(x) - imdct_direct(x)).max() < 1e-9


def test_windows_perfect_reconstruction_mixed_blocks():
    """Princen-Bradley across short→long→short: windowed MDCT/IMDCT frames
    overlap-added through the decoder's OverlapAdder reconstruct the input
    exactly — pinning the narrowed slopes on long blocks next to short
    ones AND the mixed-size emit arithmetic."""
    bs0, bs1 = 256, 1024
    flags = [0, 0, 1, 1, 1, 0, 0, 1, 0]  # short/long sequence
    sizes = [bs1 if f else bs0 for f in flags]
    total = sum(s // 4 for s in sizes) * 2
    rng = np.random.default_rng(3)
    x = rng.standard_normal(total + bs1) * 0.3
    ola = OverlapAdder()
    out = []
    center = 0  # absolute center position of the current frame
    for i, n in enumerate(sizes):
        prev_f = flags[i - 1] if i > 0 else 1
        next_f = flags[i + 1] if i + 1 < len(sizes) else 1
        w = vorbis_window(n, bs0, prev_f, next_f, bool(flags[i]))
        if i == 0:
            center = n // 2
            start = 0
        else:
            start = center - n // 2
        sl = x[start : start + n]
        # analysis: window → MDCT → IMDCT → window (no quantization)
        j = np.arange(n)[None, :]
        k = np.arange(n // 2)[:, None]
        c = np.cos(np.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
        spec = (4.0 / n) * (c @ (w * sl))
        chunk = ola.add((imdct(spec) * w)[None, :])
        if chunk is not None:
            out.append(chunk[0])
        if i + 1 < len(sizes):
            center += n // 4 + sizes[i + 1] // 4
    rec = np.concatenate(out)
    # first emitted sample is at absolute position sizes[0]//2 (center 0)
    lead = sizes[0] // 2
    assert np.abs(rec - x[lead : lead + len(rec)]).max() < 1e-10


# ------------------------------------------------------------ ogg layer

def test_ogg_packet_roundtrip_and_granules():
    w = OggWriter(serial=42)
    pkts = [b"a" * 10, b"b" * 300, b"c" * 255, b"", b"d" * 1000]
    for i, p in enumerate(pkts):
        w.write_packet(p, granule=i * 100)
    buf = w.close(9999)
    got = list(iter_ogg_packets(buf))
    assert [p for p, _g in got] == pkts
    assert last_granule(buf) == 9999


def test_ogg_packet_spans_pages():
    # tiny pages force both continuation pages and packet spanning
    w = OggWriter(serial=1, max_segments=2)
    pkts = [b"x" * 700, b"y" * 5, b"z" * 600]
    for p in pkts:
        w.write_packet(p, granule=0)
    buf = w.close(77)
    assert buf.count(b"OggS") > 3  # really multi-page
    assert [p for p, _g in iter_ogg_packets(buf)] == pkts
    assert last_granule(buf) == 77


def test_ogg_crc_corruption_detected():
    w = OggWriter(serial=7)
    w.write_packet(b"hello vorbis", granule=1)
    buf = bytearray(w.close(12))
    buf[30] ^= 0xFF  # flip a body byte (header 27 + 1 lacing + body)
    with pytest.raises(ValueError, match="CRC"):
        list(iter_ogg_packets(bytes(buf)))


def test_ogg_sequence_gap_detected():
    w = OggWriter(serial=7)
    w.write_packet(b"a" * 10, granule=1, flush_after=True)
    w.write_packet(b"b" * 10, granule=2, flush_after=True)
    w.write_packet(b"c" * 10, granule=3)
    buf = w.close(3)
    pages = buf.split(b"OggS")[1:]
    assert len(pages) == 3
    dropped = b"OggS" + pages[0] + b"OggS" + pages[2]
    with pytest.raises(ValueError, match="sequence gap"):
        list(iter_ogg_packets(dropped))


def test_ogg_multiplexed_streams_decode_first_serial():
    """Skeleton-style muxing: pages of a second serial interleave with the
    first BOS stream.  The iterator must lock onto the first serial and
    skip the others instead of raising 'sequence gap' (each serial numbers
    its own pages from 0)."""
    a = OggWriter(serial=11)
    a.write_packet(b"audio-0" * 20, granule=1, flush_after=True)
    a.write_packet(b"audio-1" * 20, granule=2)
    a_pages = a.close(2).split(b"OggS")[1:]
    b = OggWriter(serial=22)
    b.write_packet(b"meta-0", granule=0, flush_after=True)
    b.write_packet(b"meta-1", granule=0)
    b_pages = b.close(0).split(b"OggS")[1:]
    # interleave: a0 b0 a1 b1 a2(eos) b2(eos)
    mux = b"".join(
        b"OggS" + p
        for pair in zip(a_pages, b_pages)
        for p in pair
    )
    got = [p for p, _g in iter_ogg_packets(mux)]
    assert got == [b"audio-0" * 20, b"audio-1" * 20]


def test_ogg_chained_file_decodes_first_link():
    """A chained file (second BOS stream after the first EOS) must decode
    its first link and stop — not raise on the restarted sequence."""
    a = OggWriter(serial=5)
    a.write_packet(b"first-link", granule=7)
    b = OggWriter(serial=6)
    b.write_packet(b"second-link", granule=9)
    chained = a.close(7) + b.close(9)
    got = list(iter_ogg_packets(chained))
    assert got == [(b"first-link", 7)]


def test_ogg_sequence_gap_in_locked_stream_still_raises():
    """Serial-aware tracking must not weaken loss detection for the
    stream actually being decoded."""
    w = OggWriter(serial=7)
    w.write_packet(b"a" * 10, granule=1, flush_after=True)
    w.write_packet(b"b" * 10, granule=2, flush_after=True)
    w.write_packet(b"c" * 10, granule=3)
    buf = w.close(3)
    pages = buf.split(b"OggS")[1:]
    other = OggWriter(serial=9)
    other.write_packet(b"zz", granule=0)
    other_page = other.close(0).split(b"OggS")[1:][0]
    # drop page 1 of serial 7 but keep an innocent serial-9 page in between
    dropped = (b"OggS" + pages[0] + b"OggS" + other_page
               + b"OggS" + pages[2])
    with pytest.raises(ValueError, match="sequence gap"):
        list(iter_ogg_packets(dropped))


def test_ogg_crc_known_zero_input():
    # table sanity: CRC of empty input is 0; one zero byte stays 0
    assert ogg_crc(b"") == 0
    assert ogg_crc(b"\x00") == 0
    assert ogg_crc(b"\x01") == 0x04C11DB7


# ----------------------------------------------------------- end to end

@pytest.mark.parametrize("ln", [4000, 4500, 127, 128, 129])
def test_vorbis_mono_roundtrip_matches_oracle(ln):
    pcm = make_pcm(ln)
    out, rate = decode_ogg_vorbis(encode_vorbis_ogg(pcm, 8000))
    assert rate == 8000
    assert len(out) == ln  # granule truncation: exact sample count
    exp = to_int16(expected_synthesis(pcm)[0])
    assert np.array_equal(out, exp)
    # fidelity sanity: quantization error is bounded, not silence
    assert np.abs(out.astype(int) - pcm.astype(int)).max() < 600
    assert float(np.sqrt(np.mean((out / 32768.0) ** 2))) > 0


def test_vorbis_stereo_coupling_residue2_matches_oracle():
    base = make_pcm(4000, seed=11)
    st2 = np.stack([base, (base[::-1] // 2).astype(np.int16)])
    out, rate = decode_ogg_vorbis(encode_vorbis_ogg(st2, 16000))
    assert rate == 16000
    assert len(out) == 4000
    exp = to_int16(expected_synthesis(st2).mean(axis=0))
    assert np.array_equal(out, exp)


def test_vorbis_multipage_small_pages():
    pcm = make_pcm(2000, seed=5)
    buf = encode_vorbis_ogg(pcm, 8000, max_segments=3)
    out, _ = decode_ogg_vorbis(buf)
    assert np.array_equal(out, to_int16(expected_synthesis(pcm)[0]))


def test_vorbis_coupling_inversion_property():
    """couple_levels then the decoder's §4.3.5 table returns the inputs
    exactly, for every quadrant — the table re-implemented here from the
    spec text, not imported from the decoder."""
    from tableextraction_spark.vorbis import _ZQ, couple_levels

    rng = np.random.default_rng(0)
    x = rng.integers(-1000, 1000, 4096)
    y = rng.integers(-1000, 1000, 4096)
    qm, qa = couple_levels(x + _ZQ, y + _ZQ)
    m = qm - _ZQ
    a = qa - _ZQ
    new_m = np.where(m > 0, np.where(a > 0, m, m + a), np.where(a > 0, m, m - a))
    new_a = np.where(m > 0, np.where(a > 0, m - a, m), np.where(a > 0, m + a, m))
    assert np.array_equal(new_m, x)
    assert np.array_equal(new_a, y)


def test_vorbis_truncated_audio_packet_is_silent_not_fatal():
    """The spec's end-of-packet rule: a frame cut mid-residue decodes as
    silence; the rest of the stream still decodes."""
    pcm = make_pcm(1000, seed=9)
    pkts = [(p, g) for p, g in iter_ogg_packets(encode_vorbis_ogg(pcm, 8000))]
    w = OggWriter(serial=3)
    for i, (p, g) in enumerate(pkts):
        if i == 5:  # an audio packet (first three are headers)
            p = p[:4]
        w.write_packet(p, g)
    buf = w.close(1000)
    out, rate = decode_ogg_vorbis(buf)
    assert rate == 8000
    assert len(out) == 1000  # granule still honored
    full = to_int16(expected_synthesis(pcm)[0])
    # outside the two chunks the cut frame touches, decode is unchanged
    assert np.array_equal(out[:128], full[:128])
    assert np.array_equal(out[3 * 128 :], full[3 * 128 :])


def test_vorbis_headers_missing_raises():
    full = encode_vorbis_ogg(make_pcm(200), 8000)
    id_pkt = next(iter_ogg_packets(full))[0]  # a VALID id header, alone
    w = OggWriter(serial=4)
    w.write_packet(id_pkt, 0)
    with pytest.raises(ValueError, match="three headers"):
        decode_ogg_vorbis(w.close(0))


def test_single_entry_codebook_decodes_with_one_bit():
    from tableextraction_spark.vorbis import BitReader

    book = Codebook(1, [0, 3, 0])
    br = BitReader(b"\x00\x01")
    assert book.decode_scalar(br) == 1
    assert br.pos == 1


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_vorbis_never_hangs_on_arbitrary_bytes(data):
    """Hostile-input bound: arbitrary bytes either decode or raise a named
    error — never hang, never allocate unbounded, never segfault."""
    try:
        decode_ogg_vorbis(b"OggS" + data)
    except (ValueError, NotImplementedError):
        pass
    try:
        decode_ogg_vorbis(data)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=3000),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.booleans(),
)
def test_vorbis_any_pcm_roundtrips_to_oracle(n, seed, stereo):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-2500, 2500, (2, n) if stereo else n).astype(np.int16)
    out, _ = decode_ogg_vorbis(encode_vorbis_ogg(pcm, 8000))
    exp = expected_synthesis(pcm)
    exp = exp.mean(axis=0) if stereo else exp[0]
    assert np.array_equal(out, to_int16(exp))
    assert len(out) == n


def test_ogg_page_boundary_packet_not_marked_continued():
    """A packet ending exactly at the max_segments page boundary must not
    mark the NEXT page continued (regression: the writer set the flag
    whenever a flush happened mid-write-loop)."""
    w = OggWriter(serial=9, max_segments=2)
    w.write_packet(b"a" * 300, granule=1)  # exactly 2 segments (255+45)
    w.write_packet(b"b" * 10, granule=2)  # must start a FRESH page
    buf = w.close(2)
    pages = [b"OggS" + p for p in buf.split(b"OggS")[1:]]
    # header_type byte is at offset 5; bit 0 = continued
    # page 1: packet a (exactly 2 segments); page 2: packet b + EOS
    flags = [p[5] & 0x01 for p in pages]
    assert flags == [0, 0], flags
    assert [p for p, _ in iter_ogg_packets(buf)] == [b"a" * 300, b"b" * 10]


def test_ogg_orphaned_continued_packet_discarded():
    """Joining a stream at a CONTINUED page discards the partial packet
    up to the first boundary (RFC 3533 §6) instead of yielding its tail
    as data."""
    w = OggWriter(serial=9, max_segments=2)
    w.write_packet(b"x" * 600, granule=5)  # spans pages
    w.write_packet(b"y" * 7, granule=6)
    buf = w.close(6)
    pages = buf.split(b"OggS")[1:]
    # drop the first page; renumber is not attempted — instead start the
    # kept pages as their own buffer and relax: rebuild with sequence 0
    import struct

    kept = bytearray(b"OggS" + pages[1])
    assert kept[5] & 0x01  # really a continued page
    # fix sequence numbers so only the orphan rule is under test
    out = bytearray()
    seq = 0
    for page in [bytes(kept), *(b"OggS" + p for p in pages[2:])]:
        page = bytearray(page)
        struct.pack_into("<I", page, 18, seq)
        seq += 1
        struct.pack_into("<I", page, 22, 0)
        from tableextraction_spark.ogg import ogg_crc

        struct.pack_into("<I", page, 22, ogg_crc(bytes(page)))
        out += page
    pkts = [p for p, _ in iter_ogg_packets(bytes(out))]
    assert pkts == [b"y" * 7]  # the x-tail was discarded, y survived


def test_floor1_classed_decode_is_stateless_across_channels():
    """A floor with partitions > 0 (classed Y residuals — the shape real
    encoders emit, which the fixture encoder never writes): decoding a
    second packet must not change the curve of the first (regression:
    step2 flags were stored on the shared Floor1 object)."""
    from tableextraction_spark.vorbis import BitReader, BitWriter, Floor1

    book = Codebook(1, [2, 2, 2, 2])
    hdr = BitWriter()
    hdr.write(1, 5)  # one partition
    hdr.write(0, 4)  # class 0
    hdr.write(1, 3)  # class dim - 1 → 2
    hdr.write(0, 2)  # subclass bits
    hdr.write(0 + 1, 8)  # subclass book → book 0
    hdr.write(0, 2)  # multiplier - 1
    hdr.write(6, 4)  # rangebits → X = [0, 64]
    hdr.write(20, 6)  # X[2]
    hdr.write(40, 6)  # X[3]
    fl = Floor1(BitReader(hdr.bytes()), [book])

    def packet(y0, y1, r2, r3):
        bw = BitWriter()
        bw.write(1, 1)
        bw.write(y0, 8)
        bw.write(y1, 8)
        for r in (r2, r3):
            code, ln = book.codewords[r]
            bw.write_codeword(code, ln)
        return BitReader(bw.bytes())

    dec_a = fl.decode(packet(100, 50, 3, 0))
    curve_a_before = fl.curve(dec_a[0], dec_a[1], 64).copy()
    dec_b = fl.decode(packet(10, 200, 0, 2))
    curve_b = fl.curve(dec_b[0], dec_b[1], 64)
    curve_a_after = fl.curve(dec_a[0], dec_a[1], 64)
    assert np.array_equal(curve_a_before, curve_a_after)
    assert not np.array_equal(curve_a_before, curve_b)
    # the r3=0 point decodes as predicted-only (step2 False there)
    assert dec_a[1][3] is False or dec_a[1][3] == False  # noqa: E712


def test_endofpacket_is_a_valueerror():
    """A hostile audio packet shorter than its header bits surfaces as a
    ValueError (per-row error upstream), not a foreign exception type."""
    from tableextraction_spark.vorbis import EndOfPacket

    assert issubclass(EndOfPacket, ValueError)
    pcm = make_pcm(500)
    pkts = list(iter_ogg_packets(encode_vorbis_ogg(pcm, 8000)))
    w = OggWriter(serial=2)
    for i, (p, g) in enumerate(pkts[:3]):
        w.write_packet(p, g)
    w.write_packet(b"", 0)  # zero-length audio packet: skipped, not fatal
    out, rate = decode_ogg_vorbis(w.close(0))
    assert rate == 8000 and len(out) == 0


def test_truncated_audio_packet_keeps_decoded_prefix():
    """Spec §4.3 end-of-packet rule, libvorbis parity: a mid-frame cut
    keeps the floors and residues decoded before it and zeroes only the
    remainder — it must NOT discard the whole frame to silence."""
    from tableextraction_spark.vorbis import VorbisDecoder

    pcm = make_pcm(2000)
    pkts = list(iter_ogg_packets(encode_vorbis_ogg(pcm, 8000)))
    dec = VorbisDecoder()
    for p, _g in pkts[:3]:
        dec.header_packet(p)
    audio = [p for p, _g in pkts[3:] if p]
    pkt = audio[2]
    full, n, pf, nf = dec.decode_audio_packet(pkt)
    trunc, n2, pf2, nf2 = dec.decode_audio_packet(pkt[:-1])
    assert (n2, pf2, nf2) == (n, pf, nf)
    # decoded prefix survives: the truncated frame carries real signal...
    assert np.abs(trunc).sum() > 0
    # ...and the one dropped byte can only perturb the tail-coded residue,
    # so the frame stays close to the full decode (the old zero-the-frame
    # behavior fails this with diff == full energy)
    assert np.abs(full - trunc).sum() < 0.5 * np.abs(full).sum()


def test_truncated_packet_stream_still_decodes_end_to_end():
    """A stream whose final audio packet is truncated decodes without
    error and matches the intact stream everywhere before the cut."""
    pcm = make_pcm(1500)
    buf = encode_vorbis_ogg(pcm, 8000)
    pkts = list(iter_ogg_packets(buf))
    w = OggWriter(serial=3)
    for p, g in pkts[:-1]:
        w.write_packet(p, g)
    last_p, last_g = pkts[-1]
    w.write_packet(last_p[: max(1, len(last_p) - 2)], last_g)
    out_t, rate = decode_ogg_vorbis(w.close(last_g))
    out_f, _ = decode_ogg_vorbis(buf)
    assert rate == 8000
    m = min(len(out_t), len(out_f)) - 256  # the final frame may differ
    assert m > 0
    assert np.array_equal(out_t[:m], out_f[:m])

"""FLAC codec: exact lossless round-trips through every encoder subframe
mode and stereo decorrelation, CRC enforcement, hostile-input bounds, and
the multimodal audio route."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tableextraction_spark import multimodal as mm
from tableextraction_spark.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
    parse_streaminfo,
)


def _sig(n, seed=0):
    rng = np.random.default_rng(seed)
    return (np.sin(np.linspace(0, 80, n)) * 12000 + rng.normal(0, 60, n)).astype(
        np.int16
    )


@pytest.mark.parametrize("mode", ["verbatim", "fixed"])
def test_mono_roundtrip_exact(mode):
    pcm = _sig(5000)
    out, rate = decode_flac(encode_flac(pcm, 16000, block_size=999, subframe=mode))
    assert rate == 16000 and np.array_equal(out, pcm)


def test_fixed_actually_compresses():
    pcm = _sig(8000)
    v = encode_flac(pcm, 16000, subframe="verbatim")
    f = encode_flac(pcm, 16000, subframe="fixed")
    assert len(f) < 0.7 * len(v)  # smooth signal: order-2 residuals are small


def test_short_final_frame():
    pcm = _sig(1001)  # 1000-sample blocks → final frame of 1 sample
    out, _ = decode_flac(encode_flac(pcm, 8000, block_size=1000))
    assert np.array_equal(out, pcm)


def test_constant_signal():
    pcm = np.full(2048, -1234, dtype=np.int16)
    out, _ = decode_flac(encode_flac(pcm, 8000))
    assert np.array_equal(out, pcm)


@pytest.mark.parametrize("stereo", ["independent", "mid-side"])
@pytest.mark.parametrize("mode", ["verbatim", "fixed"])
def test_stereo_downmix_matches_wav_convention(stereo, mode):
    n = 3000
    left = (np.sin(np.linspace(0, 50, n)) * 9000).astype(np.int16)
    right = (np.cos(np.linspace(0, 70, n)) * 7000).astype(np.int16)
    inter = np.empty(n * 2, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    blob = encode_flac(
        inter, 22050, block_size=700, subframe=mode, n_channels=2, stereo=stereo
    )
    out, rate = decode_flac(blob)
    # the decoder downmixes exactly like the WAV path: channel mean
    want = (
        np.stack([left, right]).astype(np.int64).mean(axis=0).astype(np.int16)
    )
    assert rate == 22050 and np.array_equal(out, want)


def test_streaminfo_fields():
    info = parse_streaminfo(encode_flac(_sig(500), 44100))
    assert info["sample_rate"] == 44100
    assert info["channels"] == 1 and info["bps"] == 16
    assert info["total_samples"] == 500


def test_header_crc8_mismatch_is_error():
    blob = bytearray(encode_flac(_sig(300), 8000))
    info = parse_streaminfo(bytes(blob))
    blob[info["frames_start"] + 2] ^= 0x04  # corrupt a frame-header byte
    with pytest.raises(ValueError, match="CRC-8|sync|reserved"):
        decode_flac(bytes(blob))


def test_frame_crc16_mismatch_is_error():
    blob = bytearray(encode_flac(_sig(300), 8000))
    blob[-3] ^= 0x10  # corrupt audio payload near the end of the last frame
    with pytest.raises(ValueError, match="CRC-16|truncated|unary"):
        decode_flac(bytes(blob))


def test_truncated_stream_is_error():
    blob = encode_flac(_sig(2000), 8000)
    with pytest.raises(ValueError):
        decode_flac(blob[: len(blob) // 2])


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"OggS" + b"\x00" * 40)


def test_crc_vectors():
    # spec polys: CRC-8 0x07, CRC-16 0x8005, both init 0 (check values for
    # the standard "123456789" test string)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_multimodal_route_and_features(spark):
    pcm = _sig(16000)  # 1 s @ 16 kHz
    flac = encode_flac(pcm, 16000)
    df = spark.createDataFrame(
        [("clip", bytearray(flac)), ("mp3", bytearray(b"ID3\x04" + b"\x00" * 32))],
        "media_ref string, content binary",
    )
    got = {r.media_ref: r for r in mm.audio_features(df).collect()}
    clip = got["clip"]
    assert clip.error is None and clip.sample_rate == 16000
    assert abs(clip.duration_s - 1.0) < 1e-9 and clip.rms > 0
    assert got["mp3"].error  # MP3 stays a named stub


def test_wav_and_flac_agree_on_features():
    pcm = _sig(8000, seed=3)
    w, rw = mm.decode_audio(mm.encode_wav(pcm, 8000))
    f, rf = mm.decode_audio(encode_flac(pcm, 8000))
    assert rw == rf == 8000
    assert np.array_equal(w, f)  # both lossless: identical samples


def test_truncated_at_header_crc_is_value_error_not_index_error():
    # regression: truncation exactly at the frame-header CRC byte raised
    # IndexError, violating the module's ValueError contract
    blob = encode_flac(_sig(300), 8000)
    info = parse_streaminfo(blob)
    for cut in range(info["frames_start"], min(info["frames_start"] + 12, len(blob))):
        with pytest.raises(ValueError):
            decode_flac(blob[:cut])


def test_reserved_bps_code_raises_not_guesses():
    """Frame-header bps code 3 is reserved (RFC 9639 §9.1.4): the decoder
    must refuse loudly like sr_code==15 does, never fall back to the
    STREAMINFO bit depth (ADVICE r3)."""
    payload = bytearray(encode_flac(_sig(600), 16000))
    start = parse_streaminfo(bytes(payload))["frames_start"]
    # byte 3 of the frame header: ch_code(4) | bps_code(3) | reserved(1)
    payload[start + 3] = (payload[start + 3] & 0xF1) | (3 << 1)
    with pytest.raises(ValueError, match="reserved bps code 3"):
        decode_flac(bytes(payload))


@given(st.binary(max_size=300))
def test_crc16_vectorized_matches_reference(data):
    """The GF(2)-linear vectorized CRC-16 must equal the literal bitwise
    reference on arbitrary bytes (both poly 0x8005, init 0)."""
    from tableextraction_spark.flac import _crc16, _crc16_ref

    assert _crc16(data) == _crc16_ref(data)


@given(
    st.lists(st.integers(-(1 << 12), 1 << 12), min_size=0, max_size=80),
    st.integers(0, 14),
)
@settings(deadline=None)
def test_rice_bulk_matches_scalar_reference(values, k):
    """rice_bulk must bit-exactly invert a scalar Rice encoder for any
    residual values and parameter (value/size bounds keep the TEST's own
    per-bit encoder fast; the huge-quotient edge has its own case
    below)."""
    import numpy as np

    from tableextraction_spark.flac import _Bits

    bits = []
    for v in values:
        z = 2 * v if v >= 0 else -2 * v - 1  # zigzag
        q, r = z >> k, z & ((1 << k) - 1)
        bits.extend([0] * q + [1])
        bits.extend((r >> (k - 1 - j)) & 1 for j in range(k))
    bits.extend([1] * 7)  # trailing padding ones (must not be consumed)
    buf = bytes(
        int("".join(map(str, bits[i : i + 8])).ljust(8, "0"), 2)
        for i in range(0, len(bits), 8)
    )
    r = _Bits(buf)
    got = r.rice_bulk(len(values), k)
    assert got.tolist() == values
    # reader must stop exactly after the last code
    total = sum((2 * v if v >= 0 else -2 * v - 1) >> k for v in values) + len(
        values
    ) * (1 + k)
    assert r.pos == total


def test_rice_bulk_truncated_raises():
    from tableextraction_spark.flac import _Bits

    with pytest.raises(ValueError, match="unary"):
        _Bits(b"\x00\x00").rice_bulk(1, 0)  # all zeros, no terminator


def test_rice_bulk_huge_quotient_and_region_growth():
    """A quotient far beyond the initial region guess (k=0, value 2^17 →
    262k zero bits) must decode exactly via the grow-retry path."""
    from tableextraction_spark.flac import _Bits

    v = 131072  # zigzag 262144
    q = 2 * v
    nbytes, rem = divmod(q, 8)
    buf = bytes(nbytes) + bytes([1 << (7 - rem)]) + b"\xff"
    r = _Bits(buf)
    assert r.rice_bulk(1, 0).tolist() == [v]
    assert r.pos == q + 1

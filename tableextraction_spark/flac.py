"""From-scratch FLAC decoder (+ fixture encoder) — no audio library.

FLAC is the dominant lossless audio format of real speech/training corpora
(LibriSpeech ships FLAC), and its wire format is a public specification
(xiph.org / RFC 9639): ``fLaC`` magic, metadata blocks (STREAMINFO),
frames with UTF-8-style coded numbers, per-channel subframes (CONSTANT /
VERBATIM / FIXED order 0-4 / LPC order 1-32), partitioned Rice-coded
residuals, and inter-channel decorrelation (left-side / right-side /
mid-side).  Decode returns (mono int16 PCM, sample_rate) matching
``multimodal.decode_audio``'s WAV contract: multi-channel downmixes by
channel mean, bit depths rescale to int16.

The encoder writes VERBATIM and FIXED(0-2)+Rice subframes — real,
spec-conformant FLAC (correct CRC-8 header and CRC-16 frame checksums) —
as the fixture generator; FLAC is lossless so round-trips are exact.
Decoder-side CRCs are verified (a corrupt frame is a per-row error, never
silently wrong samples).

Hostile-input bounds: every length is clamped to the buffer, the Rice
unary scan is bounded by the remaining bit count, and sample counts are
capped by the frame's declared block size.

Reference parity note: the reference handles images only; audio is an
engine-side corpus capability (SURVEY §2 scope note), not a port.
"""

from __future__ import annotations

import struct
import threading

import numpy as np

MAGIC = b"fLaC"

_FIXED_COEFS = {  # prediction: s[i] ≈ Σ c_k · s[i-1-k]
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SR_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16_ref(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — literal bitwise reference; the
    production ``_crc16`` below is property-tested against this."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_CRC16_POLY = 0x8005
_W16: np.ndarray | None = None  # _W16[d] = x^(8d+16) mod p, grows 2×
_W16_LOCK = threading.Lock()  # growth is read-modify-write on a global


def _crc16_shift1(a: np.ndarray) -> np.ndarray:
    """Multiply each element (a 16-bit GF(2) polynomial) by x, mod p."""
    return (
        ((a.astype(np.uint32) << 1) & 0xFFFF)
        ^ ((a >> 15).astype(np.uint32) * _CRC16_POLY)
    ).astype(np.uint16)


def _crc16_w(n: int) -> np.ndarray:
    """x^(8d+16) mod p for d = 0..n-1, cached and grown by doubling:
    the second half is x^(8k)·(first half), applied as one table-driven
    GF(2) linear map over the whole cached array."""
    global _W16
    if _W16 is not None and len(_W16) >= n:
        return _W16[:n]  # fast path: growth already done (append-only)
    with _W16_LOCK:
        if _W16 is None:
            seeds = []
            cur = _CRC16_POLY  # x^16 mod p (p is degree 16 with those taps)
            for _ in range(4):
                seeds.append(cur)
                for _ in range(8):  # ×x^8
                    cur = ((cur << 1) & 0xFFFF) ^ ((cur >> 15) * _CRC16_POLY)
            _W16 = np.array(seeds, dtype=np.uint16)
        while len(_W16) < n:
            k = len(_W16)
            basis = np.empty(16, np.uint16)
            cur = int(_W16[k - 2])  # x^(8(k-2)+16) = x^(8k) mod p
            for i in range(16):
                basis[i] = cur
                cur = ((cur << 1) & 0xFFFF) ^ ((cur >> 15) * _CRC16_POLY)
            v = np.arange(256)
            tlo = np.zeros(256, np.uint16)
            thi = np.zeros(256, np.uint16)
            for j in range(8):
                bit = ((v >> j) & 1).astype(np.uint16)
                tlo ^= bit * basis[j]
                thi ^= bit * basis[8 + j]
            _W16 = np.concatenate([_W16, tlo[_W16 & 0xFF] ^ thi[_W16 >> 8]])
        return _W16[:n]


def _crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — the whole-frame CRC.

    Vectorized via GF(2) linearity: CRC(M) = Σ_i b_i(x)·x^(8·d_i+16)
    mod p with d_i the byte's distance from the end, so the per-distance
    factors come from the cached doubling table and the eight bit planes
    of the frame fold in as numpy XORs (~8 passes, no per-byte Python)."""
    n = len(data)
    if n == 0:
        return 0
    b = np.frombuffer(bytes(data), np.uint8)
    cur = _crc16_w(n)[::-1].copy()
    acc = np.zeros(n, np.uint16)
    for j in range(8):
        acc ^= ((b >> j) & 1).astype(np.uint16) * cur
        if j < 7:
            cur = _crc16_shift1(cur)
    return int(np.bitwise_xor.reduce(acc))


class _Bits:
    """MSB-first bit reader over a byte buffer (bounded; Rice-friendly)."""

    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes, start_byte: int = 0):
        self.buf = buf
        self.pos = start_byte * 8
        self.nbits = len(buf) * 8

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("FLAC: bitstream truncated")
        self.pos = pos + n
        out = 0
        buf = self.buf
        while n:
            byte = buf[pos >> 3]
            off = pos & 7
            take = min(8 - off, n)
            out = (out << take) | ((byte >> (8 - off - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        """Count 0-bits until the terminating 1-bit (Rice quotient)."""
        pos = self.pos
        buf = self.buf
        n = 0
        while pos < self.nbits:
            byte = buf[pos >> 3]
            off = pos & 7
            rest = byte & ((1 << (8 - off)) - 1)
            if rest == 0:
                n += 8 - off
                pos += 8 - off
                continue
            lead = 8 - off - rest.bit_length()
            n += lead
            pos += lead + 1
            self.pos = pos
            return n
        raise ValueError("FLAC: unary run past end of stream")

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    # ---------------------------------------------- vectorized bulk reads

    def _unpack(self, lo: int, hi: int) -> tuple[np.ndarray, int]:
        """uint8 0/1 array covering bit span [lo, hi), byte-aligned
        outward → (bits, base_bit).  Spans are partition-local, so the
        total unpack cost across a frame is O(frame bits)."""
        b0 = lo >> 3
        b1 = min((hi + 7) >> 3, len(self.buf))
        arr = np.unpackbits(
            np.frombuffer(self.buf, np.uint8, count=b1 - b0, offset=b0)
        )
        return arr, b0 * 8

    def read_bulk(self, n: int, width: int) -> np.ndarray:
        """n fixed-width unsigned reads as one int64 vector (the
        VERBATIM / escape-partition shape)."""
        if n == 0 or width == 0:
            return np.zeros(n, np.int64)
        end = self.pos + n * width
        if end > self.nbits:
            raise ValueError("FLAC: bitstream truncated")
        arr, base = self._unpack(self.pos, end)
        seg = arr[self.pos - base : end - base].reshape(n, width)
        pw = 1 << np.arange(width - 1, -1, -1, dtype=np.int64)
        self.pos = end
        return seg.astype(np.int64) @ pw

    def read_signed_bulk(self, n: int, width: int) -> np.ndarray:
        v = self.read_bulk(n, width)
        if width:
            v = np.where(v >> (width - 1), v - (1 << width), v)
        return v

    def rice_bulk(self, nsamp: int, k: int) -> np.ndarray:
        """Decode nsamp Rice(k) codes vectorized, zigzag → signed int64.

        Terminator 1-bits are selected from the ones-position array by a
        jump-pointer doubling scan: each symbol's terminator is the first
        1-bit ≥ (previous terminator + 1 + k), so the per-index successor
        map g = searchsorted(ones, ones + 1 + k) is computed once and the
        orbit of length nsamp extracted by repeated composition — O(n log
        n) numpy gathers, no per-symbol Python.  Quotients fall out as
        position differences; the k remainder bits gather as one (n, k)
        matrix.  The first nsamp terminators sit within the first
        nsamp·(k+1)+1 ones after start (each code consumes ≤ k+1 one-
        bits), which bounds the window; the bit REGION grows adaptively
        because zero runs (quotients) are unbounded."""
        if nsamp == 0:
            return np.zeros(0, np.int64)
        start = self.pos
        # mean quotient for a well-chosen param is ~0.5-1 bit, so k+3
        # bits/sample avoids the grow-retry on typical content
        guess = nsamp * (k + 3) + 128
        while True:
            hi = min(start + guess, self.nbits)
            arr, base = self._unpack(start, hi)
            ones = np.flatnonzero(arr[start - base : hi - base]).astype(
                np.int64
            ) + start
            nw = min(len(ones), nsamp * (k + 1) + 1)
            window = ones[:nw]
            # successor map over window indices, sentinel nw absorbing
            g = np.empty(nw + 1, np.int64)
            g[:nw] = np.searchsorted(window, window + 1 + k)
            g[nw] = nw
            seq = np.zeros(1, np.int64)
            comp = g
            while len(seq) < nsamp:
                seq = np.concatenate([seq, comp[seq]])[:nsamp]
                comp = comp[comp]
            ok = nw > 0 and seq[-1] < nw
            end_pos = int(window[seq[-1]]) + 1 + k if ok else hi + 1
            if ok and end_pos <= hi:
                break
            if hi >= self.nbits:
                raise ValueError("FLAC: unary run past end of stream")
            guess *= 4  # region too small (long zero runs) — grow
        term = window[seq]
        starts = np.empty(nsamp, np.int64)
        starts[0] = start
        starts[1:] = term[:-1] + 1 + k
        v = term - starts
        if k:
            pos_mat = term[:, None] + 1 + np.arange(k)
            pw = 1 << np.arange(k - 1, -1, -1, dtype=np.int64)
            rem = arr[pos_mat - base].astype(np.int64) @ pw
            v = (v << k) | rem
        self.pos = end_pos
        return (v >> 1) ^ -(v & 1)


def _read_utf8_number(bits: _Bits) -> int:
    """The frame header's UTF-8-style coded frame/sample number."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    if n < 2 or n > 7:
        raise ValueError(f"FLAC: bad coded-number lead byte 0x{b0:02x}")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        b = bits.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("FLAC: bad coded-number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def parse_streaminfo(buf: bytes) -> dict:
    """fLaC header + metadata walk → STREAMINFO dict (+ first-frame offset)."""
    if buf[:4] != MAGIC:
        raise ValueError(f"not a FLAC stream: {buf[:4]!r}")
    pos = 4
    info = None
    while pos + 4 <= len(buf):
        hdr = buf[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        ln = int.from_bytes(buf[pos + 1 : pos + 4], "big")
        body = buf[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise ValueError("FLAC: truncated STREAMINFO")
            b = _Bits(body)
            info = {
                "min_block": b.read(16), "max_block": b.read(16),
                "min_frame": b.read(24), "max_frame": b.read(24),
                "sample_rate": b.read(20),
                "channels": b.read(3) + 1,
                "bps": b.read(5) + 1,
                "total_samples": b.read(36),
            }
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("FLAC: no STREAMINFO block")
    if info["sample_rate"] <= 0:
        raise ValueError("FLAC: zero sample rate")
    info["frames_start"] = pos
    return info


def _decode_residual(bits: _Bits, block: int, order: int) -> np.ndarray:
    """Partitioned Rice residual (RESIDUAL_CODING_METHOD 0/1) → int64."""
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"FLAC: reserved residual method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if block % nparts:
        raise ValueError("FLAC: partition order does not divide block size")
    parts: list[np.ndarray] = []
    for p in range(nparts):
        nsamp = (block >> porder) - (order if p == 0 else 0)
        if nsamp < 0:
            raise ValueError("FLAC: negative partition sample count")
        param = bits.read(plen)
        if param == escape:
            nbits = bits.read(5)
            parts.append(bits.read_signed_bulk(nsamp, nbits))
        else:
            parts.append(bits.rice_bulk(nsamp, param))
    return np.concatenate(parts)  # nparts = 1 << porder >= 1, never empty


def _decode_subframe(bits: _Bits, block: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted-bits flag: unary count - 1
        wasted = bits.unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = bits.read_signed(bps)
        samples = np.full(block, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        samples = bits.read_signed_bulk(block, bps)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = np.array(
            [bits.read_signed(bps) for _ in range(order)], dtype=np.int64
        )
        resid = _decode_residual(bits, block, order)
        # the FIXED(k) predictor makes the residual the k-th finite
        # difference of the signal — reconstruction is k cumulative sums,
        # each seeded by the (j-1)-th difference of the warm-up samples
        cur = resid
        for j in range(order, 0, -1):
            cur = np.diff(warm, j - 1)[-1] + np.cumsum(cur)
        samples = np.concatenate([warm, cur]) if order else cur
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [bits.read_signed(bps) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision escape")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [bits.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(bits, block, order).tolist()
        s = list(warm)
        for r in resid:
            pred = sum(c * s[-1 - k] for k, c in enumerate(coefs)) >> shift
            s.append(pred + r)
        samples = np.array(s, dtype=np.int64)
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = samples << wasted
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (mono int16 PCM, sample_rate) — WAV-contract shape:
    multi-channel downmixes by channel mean, bit depth rescales to 16."""
    buf = bytes(payload)
    info = parse_streaminfo(buf)
    pos = info["frames_start"]
    total = info["total_samples"]
    chans_out: list[np.ndarray] = []
    got = 0
    while pos < len(buf) and (total == 0 or got < total):
        hdr_start = pos
        bits = _Bits(buf, start_byte=pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError(f"FLAC: lost frame sync at byte {pos}")
        if bits.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        if bits.read(1):
            raise ValueError("FLAC: reserved frame-header bit set")
        _read_utf8_number(bits)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code 0")
        elif bs_code == 1:
            block = 192
        elif bs_code <= 5:
            block = 576 << (bs_code - 2)
        elif bs_code == 6:
            block = bits.read(8) + 1
        elif bs_code == 7:
            block = bits.read(16) + 1
        else:
            block = 256 << (bs_code - 8)
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        if bps_code == 0:
            bps = info["bps"]
        elif bps_code in _BPS_CODES:
            bps = _BPS_CODES[bps_code]
        else:  # reserved (3): refuse loudly, like sr_code==15 above
            raise ValueError(f"FLAC: reserved bps code {bps_code}")
        hdr_end = (bits.pos + 7) >> 3
        if hdr_end >= len(buf):
            raise ValueError("FLAC: frame header truncated")
        if _crc8(buf[hdr_start:hdr_end]) != buf[hdr_end]:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        bits.pos = (hdr_end + 1) * 8
        # channel assignment: 0-7 independent, 8 L/S, 9 R/S, 10 M/S
        if ch_code < 8:
            nch = ch_code + 1
            subs = [
                _decode_subframe(bits, block, bps) for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left-side
                left = _decode_subframe(bits, block, bps)
                side = _decode_subframe(bits, block, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right-side
                side = _decode_subframe(bits, block, bps + 1)
                right = _decode_subframe(bits, block, bps)
                subs = [right + side, right]
            else:  # mid-side: mid = (l+r)>>1 (floor), side = l-r
                mid = _decode_subframe(bits, block, bps)
                side = _decode_subframe(bits, block, bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"FLAC: reserved channel assignment {ch_code}")
        bits.align()
        frame_end = bits.pos >> 3
        if frame_end + 2 > len(buf):
            raise ValueError("FLAC: frame CRC-16 truncated")
        (crc,) = struct.unpack_from(">H", buf, frame_end)
        if _crc16(buf[hdr_start:frame_end]) != crc:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = frame_end + 2
        frame = np.stack(subs)  # (nch, block)
        if total and got + block > total:
            frame = frame[:, : total - got]
        chans_out.append(frame)
        got += frame.shape[1]
    if not chans_out:
        raise ValueError("FLAC: no audio frames")
    pcm = np.concatenate(chans_out, axis=1)  # (nch, n)
    if pcm.shape[0] > 1:
        pcm = pcm.mean(axis=0).astype(np.int64)
    else:
        pcm = pcm[0]
    bps = info["bps"]
    if bps > 16:
        pcm = pcm >> (bps - 16)
    elif bps < 16:
        pcm = pcm << (16 - bps)
    return np.clip(pcm, -32768, 32767).astype(np.int16), info["sample_rate"]


# ------------------------------------------------------------------ encode


class _BitW:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.out)


def _encode_utf8_number(w: _BitW, v: int) -> None:
    if v < 0x80:
        w.write(v, 8)
        return
    tail = []
    nbytes = 2
    while v >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        tail.append(0x80 | (v & 0x3F))
        v >>= 6
    lead = (0xFF << (8 - nbytes)) & 0xFF | v
    w.write(lead, 8)
    for b in reversed(tail):
        w.write(b, 8)


def encode_flac(
    pcm: np.ndarray,
    sample_rate: int,
    block_size: int = 4096,
    subframe: str = "fixed",
    n_channels: int = 1,
    stereo: str = "independent",
) -> bytes:
    """int16 PCM (interleaved when ``n_channels=2``) → real spec-conformant
    FLAC (fixture writer).

    ``subframe``: 'verbatim' (raw samples) or 'fixed' (best of fixed
    orders 0-2 per block + Rice residuals, porder 0).  ``stereo``:
    'independent' (two plain subframes) or 'mid-side' (mid=(l+r)>>1,
    side=l-r — exercises the decoder's decorrelation path).  Correct
    CRC-8 header and CRC-16 frame checksums throughout.
    """
    if pcm.dtype != np.int16 or pcm.ndim != 1:
        raise ValueError(f"expected int16 1-D PCM, got {pcm.dtype} {pcm.shape}")
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")
    if n_channels not in (1, 2):
        raise ValueError("n_channels must be 1 or 2")
    if n_channels == 2:
        frames_total = len(pcm) // 2
        chans = pcm[: frames_total * 2].reshape(frames_total, 2).T.astype(np.int64)
    else:
        frames_total = len(pcm)
        chans = pcm.astype(np.int64).reshape(1, -1)
    out = bytearray(MAGIC)
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(15, 5)  # bps - 1 = 15 → 16-bit
    si.write(frames_total, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset (allowed: all zero)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    mid_side = n_channels == 2 and stereo == "mid-side"
    ch_code = 10 if mid_side else n_channels - 1
    for fno, start in enumerate(range(0, frames_total, block_size)):
        blockc = chans[:, start : start + block_size]
        block = blockc.shape[1]
        w = _BitW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocking strategy
        w.write(7, 4)  # block size: 16-bit follow-up
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(ch_code, 4)
        w.write(4, 3)  # bps 16
        w.write(0, 1)
        _encode_utf8_number(w, fno)
        w.write(block - 1, 16)
        hdr = w  # CRC-8 goes over everything so far
        hdr.align()
        crc8 = _crc8(bytes(hdr.out))
        hdr.write(crc8, 8)
        if mid_side:
            left, right = blockc
            mid = (left + right) >> 1
            side = left - right
            _write_subframe(hdr, mid, subframe, bps=16)
            _write_subframe(hdr, side, subframe, bps=17)
        else:
            for c in blockc:
                _write_subframe(hdr, c, subframe, bps=16)
        hdr.align()
        frame = bytes(hdr.out)
        out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def _write_subframe(w: _BitW, chunk: np.ndarray, mode: str, bps: int = 16) -> None:
    if mode == "verbatim":
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for v in chunk:
            w.write(int(v), bps)
        return
    if mode != "fixed":
        raise ValueError(f"unknown subframe mode {mode!r}")
    # pick the fixed order 0-2 with the smallest residual magnitude sum
    best_order, best_cost = 0, None
    for order in (0, 1, 2):
        if len(chunk) <= order:
            continue
        resid = np.diff(chunk, n=order) if order else chunk
        cost = int(np.abs(resid).sum())
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    order = best_order
    resid = np.diff(chunk, n=order) if order else chunk
    w.write(0, 1)
    w.write(8 + order, 6)  # FIXED order
    w.write(0, 1)
    for v in chunk[:order]:
        w.write(int(v), bps)
    # residual: method 0 (4-bit rice), partition order 0
    w.write(0, 2)
    w.write(0, 4)
    mean = int((np.abs(resid.astype(np.int64)) * 2).mean()) if len(resid) else 0
    param = min(14, max(0, mean.bit_length() - 1))
    w.write(param, 4)
    for r in resid:
        r = int(r)
        v = (r << 1) if r >= 0 else ((-r) << 1) - 1  # decoder's zigzag inverse
        q, rem = v >> param, v & ((1 << param) - 1)
        if q:
            w.write(0, q)
        w.write(1, 1)
        if param:
            w.write(rem, param)

"""From-scratch Ogg container (RFC 3533) — page framing both directions.

The Ogg layer is pure framing: logical packets are cut into 255-byte
lacing segments, segments are grouped into pages with a 27-byte header,
and packets longer than one page continue onto the next page (the
``continued`` flag, header_type bit 0).  Each page carries a CRC-32
(polynomial 0x04C11DB7, unreflected, init 0, no final XOR — NOT the
zlib CRC) computed over the whole page with the CRC field zeroed.

Reader: ``iter_ogg_packets`` re-assembles packets across pages, verifies
every page CRC (a corrupt page is a named ValueError → a per-row error
row upstream, never silently wrong audio), and yields the page-end
granule position alongside each packet so the codec layer can truncate
to the stream's true sample count.  Writer: ``OggWriter`` emits
spec-conformant pages for the fixture encoder (``vorbis.py``).

Hostile-input bounds: header fields are length-checked before use, the
page walk advances monotonically, and a packet left open at EOF (no
terminating lacing value < 255) is dropped per RFC 3533 §6 rather than
returned as data.

Reference parity note: the reference handles images only; audio is an
engine-side corpus capability (SURVEY §2 scope note), not a port.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

MAGIC = b"OggS"
_HDR = struct.Struct("<4sBBqIIIB")  # magic, ver, type, granule, serial, seq, crc, nseg

# header_type flags (RFC 3533 §6)
CONTINUED = 0x01
BOS = 0x02
EOS = 0x04

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) if _r & 0x80000000 else (_r << 1)
    _CRC_TABLE.append(_r & 0xFFFFFFFF)


def ogg_crc(data: bytes, crc: int = 0) -> int:
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _build_page(
    header_type: int,
    granule: int,
    serial: int,
    seq: int,
    segments: list[bytes],
) -> bytes:
    if len(segments) > 255:
        raise ValueError(f"ogg page cannot carry {len(segments)} segments (max 255)")
    lacing = bytes(len(s) for s in segments)
    body = b"".join(segments)
    hdr = _HDR.pack(MAGIC, 0, header_type, granule, serial, seq, 0, len(segments))
    crc = ogg_crc(hdr + lacing + body)
    hdr = _HDR.pack(MAGIC, 0, header_type, granule, serial, seq, crc, len(segments))
    return hdr + lacing + body


class OggWriter:
    """Packets in, pages out.  ``granule`` is the stream's absolute position
    as of the END of each packet (codec units — PCM samples for Vorbis);
    the writer stamps each page with the granule of the last packet that
    COMPLETES on it, or -1 if none does (RFC 3533 §6)."""

    # max segments per page; 255 is the spec ceiling, smaller pages in
    # fixtures exercise more page boundaries per byte
    def __init__(self, serial: int, max_segments: int = 255):
        if not 1 <= max_segments <= 255:
            raise ValueError(f"max_segments must be 1..255, got {max_segments}")
        self.serial = serial
        self.max_segments = max_segments
        self.pages: list[bytes] = []
        self._seq = 0
        self._segments: list[bytes] = []
        self._granule = -1  # granule of the last packet completed on this page
        self._continued = False  # current page starts mid-packet
        self._bos_pending = True

    def _flush(self, eos: bool = False) -> None:
        if not self._segments and not eos:
            return
        htype = (CONTINUED if self._continued else 0) | (BOS if self._bos_pending else 0)
        if eos:
            htype |= EOS
        self.pages.append(
            _build_page(htype, self._granule, self.serial, self._seq, self._segments)
        )
        self._seq += 1
        self._segments = []
        self._granule = -1
        self._bos_pending = False
        self._continued = False

    def write_packet(self, packet: bytes, granule: int, flush_after: bool = False):
        """Append one logical packet.  A packet is laced as floor(len/255)
        255-byte segments plus one final segment < 255 (possibly empty), so
        packet boundaries are recoverable; segments overflow onto
        continuation pages automatically."""
        n_full, last = divmod(len(packet), 255)
        segs = [packet[i * 255 : (i + 1) * 255] for i in range(n_full)]
        segs.append(packet[n_full * 255 :])  # final segment, len == last < 255
        for k, seg in enumerate(segs):
            if len(self._segments) >= self.max_segments:
                self._flush()
                # the next page is a continuation ONLY if this packet
                # already has segments on the flushed page; a packet that
                # ended exactly at the page boundary must NOT mark the
                # next page continued
                self._continued = k > 0
            self._segments.append(seg)
            if k == len(segs) - 1:
                self._granule = granule
        if flush_after:
            self._flush()

    def close(self, granule: int) -> bytes:
        """Stamp the final page EOS with the stream-total granule (an
        empty EOS page still carries it)."""
        self._granule = granule
        self._flush(eos=True)
        return b"".join(self.pages)


def iter_ogg_packets(buf: bytes) -> Iterator[tuple[bytes, int]]:
    """Yield ``(packet, page_granule)`` for every completed packet of the
    FIRST logical stream.

    The iterator locks onto the first page's serial number; pages of other
    serials (multiplexed skeleton/metadata streams) are CRC-verified and
    skipped, and the locked stream's EOS ends iteration — so a chained
    file (a second BOS after the first stream's EOS, RFC 3533 §4) decodes
    its first link instead of raising.  Each serial's page sequence is
    tracked independently: a gap or duplicate IN THE LOCKED STREAM raises
    (silent packet loss is the one failure an audio gate cannot see).

    ``page_granule`` is the granule position of the page the packet ENDS
    on (-1 where the muxer stamped none).  Pages are CRC-verified; a
    mismatch or a malformed header raises ValueError naming the page.
    """
    pos = 0
    pending = bytearray()
    locked_serial: int | None = None
    expect_seq: dict[int, int] = {}
    while pos < len(buf):
        if buf[pos : pos + 4] != MAGIC:
            raise ValueError(f"ogg: bad capture pattern at byte {pos}")
        if pos + 27 > len(buf):
            raise ValueError(f"ogg: truncated page header at byte {pos}")
        magic, ver, htype, granule, serial, seq, crc, nseg = _HDR.unpack_from(buf, pos)
        if ver != 0:
            raise ValueError(f"ogg: unsupported stream structure version {ver}")
        lace_off = pos + 27
        body_off = lace_off + nseg
        if body_off > len(buf):
            raise ValueError(f"ogg: truncated segment table at byte {pos}")
        lacing = buf[lace_off:body_off]
        body_len = sum(lacing)
        if body_off + body_len > len(buf):
            raise ValueError(f"ogg: truncated page body at byte {pos}")
        page = bytearray(buf[pos : body_off + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc:
            raise ValueError(f"ogg: CRC mismatch on page seq {seq} at byte {pos}")
        if locked_serial is None:
            locked_serial = serial  # first page wins (BOS in a valid file)
        want = expect_seq.get(serial)
        if want is not None and seq != want:
            if serial == locked_serial:
                raise ValueError(
                    f"ogg: page sequence gap (want {want}, got {seq})"
                )
        expect_seq[serial] = seq + 1
        if serial != locked_serial:
            pos = body_off + body_len  # other muxed stream: skip its pages
            continue
        if not (htype & CONTINUED) and pending:
            # muxer dropped the tail of an unfinished packet — RFC 3533 §6
            pending = bytearray()
        # a CONTINUED page with nothing pending means we joined mid-packet:
        # discard segments up to the first packet boundary (RFC 3533 §6)
        orphaned = bool(htype & CONTINUED) and not pending
        off = body_off
        for k, lv in enumerate(lacing):
            if not orphaned:
                pending += buf[off : off + lv]
            off += lv
            if lv < 255:
                if orphaned:
                    orphaned = False
                else:
                    # page granule applies to packets ending on this page
                    yield bytes(pending), granule
                    pending = bytearray()
        if htype & EOS:
            return  # locked stream ended; later chain links are ignored
        pos = body_off + body_len
    # a packet still pending at EOF was never terminated: drop per RFC 3533


def last_granule(buf: bytes) -> int:
    """Granule position of the last page (the stream's total length in
    codec units) — O(tail) scan, shared with ``probe._probe_ogg``."""
    p = buf.rfind(MAGIC)
    while p > 0 and (p + 27 > len(buf) or buf[p + 4] != 0):
        p = buf.rfind(MAGIC, 0, p)
    if p < 0 or p + 14 > len(buf):
        return -1
    return struct.unpack_from("<q", buf, p + 6)[0]

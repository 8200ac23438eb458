"""Shared variable-width LZW decode core for the GIF and TIFF lanes.

One algorithm, two wire flavors (the r5 review's dedup ask):

- **GIF** (GIF89a appendix F): LSB-first code packing, late width change
  (bump when the table REACHES 2^w), ``end`` code stops decode.
- **TIFF** (TIFF 6.0 §13): MSB-first packing, *early* width change (bump
  one entry sooner — the decoder, one add behind the encoder, bumps at
  2^w − 2), EOI before the declared size is an error.

Both reduce to the same parameters: ``clear = 1 << min_code``,
``end = clear + 1``, first dynamic entry at ``clear + 2`` (TIFF is
simply ``min_code = 8``).  The dictionary is held as (src, len) slices
over the emitted output — every entry's string is a contiguous run of
already-emitted bytes (entry j, created while processing code k, is
exactly ``out[s_{k-1} : s_{k-1}+len_{k-1}+1]``), so emission is one
bytearray slice copy per code and the cSc code (== next free slot)
copies prefix-then-firstchar across its one-byte self-overlap.  Growth
is capped at the 12-bit 4096-entry ceiling on both flavors.

Bit I/O uses vectorized 16-bit windows materialized per bounded chunk
(LSB windows here, MSB from the JPEG lane) — one list index per code.
"""

from __future__ import annotations

import numpy as np

_WIN_CHUNK = 1 << 20  # window entries per materialized slice; see
# gif.py's memory rationale — peak heap is one chunk's window list
# regardless of stream size


def _win_slice_lsb(data: bytes, cbase: int, cend: int) -> list[int]:
    """win[i-cbase] = the 16 bits starting at bit i, LSB-first, for
    i in [cbase, cend) — built from only the covering byte range."""
    b0 = cbase >> 3
    b1 = min(len(data), ((cend + 16) >> 3) + 1)
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8, offset=b0, count=b1 - b0),
        bitorder="little",
    ).astype(np.uint32)
    lo = cbase - b0 * 8
    n = cend - cbase
    padded = np.concatenate([bits[lo:], np.zeros(16, dtype=np.uint32)])
    acc = np.zeros(n, dtype=np.uint32)
    for k in range(16):
        acc += padded[k : k + n] << np.uint32(k)
    return acc.tolist()


def decode_slices(
    data: bytes,
    npix: int,
    min_code: int,
    *,
    msb: bool,
    early: int,
    eoi_raises: bool,
    msg_truncated: str,
    msg_invalid: str,
    msg_eoi: str | None = None,
    msg_short: str | None = None,
) -> bytes:
    """Decode exactly ``npix`` bytes (a final entry may overshoot and is
    trimmed).  ``early`` is the width-change offset: the width bumps
    when the table size reaches ``2^w - early`` (GIF 0, TIFF 2).
    Raises ValueError with the caller's messages on truncation, invalid
    codes, or (``eoi_raises``) an early EOI; a too-short stream whose
    end code arrived early raises ``msg_truncated`` too."""
    if msb:
        from .jpeg import _win_slice_msb as winfn
    else:
        winfn = _win_slice_lsb
    clear = 1 << min_code
    end = clear + 1
    nbits = len(data) * 8
    cbase, cend = 0, min(nbits, _WIN_CHUNK)
    win = winfn(data, 0, cend)
    bpos = 0
    out = bytearray(npix + 4097)  # slack: a final entry may overshoot
    pos = 0
    srcs = [0] * 4096  # entry j → start of its slice in out
    lens = [1] * 4096  # entry j → slice length
    tsize = clear + 2
    width = min_code + 1
    # one branch-free extraction for both flavors: MSB shifts the
    # 16-bit window down to its top `width` bits (mask then a no-op),
    # LSB masks the bottom `width` bits (shift 0) — shift/mask are
    # updated only on width changes, never per code
    shift = (16 - width) if msb else 0
    mask = (1 << width) - 1
    prev_src, prev_len = -1, 0  # previous code's emitted slice

    while pos < npix:
        if bpos + width > nbits:
            raise ValueError(msg_truncated)
        if bpos >= cend:
            cbase = bpos
            cend = min(nbits, cbase + _WIN_CHUNK)
            win = winfn(data, cbase, cend)
        code = (win[bpos - cbase] >> shift) & mask
        bpos += width
        if code == clear:
            tsize = clear + 2
            width = min_code + 1
            shift = (16 - width) if msb else 0
            mask = (1 << width) - 1
            prev_src, prev_len = -1, 0
            continue
        if code == end:
            if eoi_raises:
                raise ValueError(msg_eoi)
            break
        if code < clear:  # literal
            s, ln = pos, 1
            out[pos] = code
        elif clear + 2 <= code < tsize:
            s, ln = pos, lens[code]
            src = srcs[code]
            out[pos : pos + ln] = out[src : src + ln]
        elif code == tsize and prev_len > 0 and tsize < 4096:
            # cSc: previous string + its own first char — the source's
            # last byte IS the first target byte, so copy prefix then
            # first char (the one overlap every LZW decoder must order)
            s, ln = pos, prev_len + 1
            out[pos : pos + ln - 1] = out[prev_src : prev_src + ln - 1]
            out[pos + ln - 1] = out[prev_src]
        else:
            raise ValueError(msg_invalid.format(code=code))
        if prev_len > 0 and tsize < 4096:
            srcs[tsize] = prev_src
            lens[tsize] = prev_len + 1
            tsize += 1
            if tsize >= (1 << width) - early and width < 12:
                width += 1
                shift = (16 - width) if msb else 0
                mask = (1 << width) - 1
        prev_src, prev_len = s, ln
        pos += ln
    if pos < npix:
        raise ValueError(
            (msg_short or msg_truncated).format(pos=pos, npix=npix)
        )
    return bytes(out[:npix])

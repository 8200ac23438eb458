"""From-scratch Vorbis I decoder (+ fixture encoder) — no audio library.

Ogg/Vorbis is the web's historical open audio format; its wire format is
the public Vorbis I specification (xiph.org).  This module implements the
decode side in full generality for the shapes real encoders emit:

- LSb-first bitpacking (spec §2), Huffman codebooks with the spec's
  lowest-available-codeword assignment (§3.2.1, pinned to the spec's
  worked example in tests), scalar + VQ lookup types 0/1/2,
- floor type 1 (classes, predicted-Y residuals, Bresenham line render,
  inverse-dB amplitude table; floor type 0 is a named legacy seam),
- residue types 0, 1 and 2 (cascades, classword partitions, interleave),
- channel coupling (square polar, §4.3.5),
- IMDCT via an N-point IFFT with pre/post twiddles (O(N log N); pinned
  against the spec's direct cosine formula in tests),
- window shapes for both block sizes incl. mixed long/short transitions,
  center-aligned overlap-add, and granule-position end truncation.

The inverse-dB table is generated as ``10 ** ((i - 255) * 7 / 256)``
(endpoints 1.0649863e-07 and 1.0 match the normative table; the published
table was computed in float32, so intermediate entries may differ by
≲1e-6 relative — an amplitude deviation far below the int16 LSB).

The encoder writes real, spec-conformant Ogg/Vorbis — one fixed 256-sample
block size, a flat floor (floor1 with zero partitions, gain ≈ 9.8e-4 so
the ±8 book range carries a fine effective grid), scalar-quantized MDCT
coefficients carried by a dims=1 lookup-type-2 residue book, and
optionally stereo with square-polar coupling + residue type 2 —
so round-trips need no external encoder (the JBIG2/FLAC precedent).
Quantization is the only loss: tests compare decoder PCM against an
independently computed synthesis of the same quantized spectrum.

Hostile-input bounds: every count is range-checked before allocation
(entries ≤ 2^22, dims bounded, lengths ≤ 32), the Huffman walk is depth-
bounded, and a packet exhausted mid-frame renders that frame silent (the
spec's end-of-packet rule) instead of raising.

Reference parity note: the reference handles images only; audio is an
engine-side corpus capability (SURVEY §2 scope note), not a port.
"""

from __future__ import annotations

import numpy as np

from .ogg import OggWriter, iter_ogg_packets

_MAX_ENTRIES = 1 << 22  # codebook allocation bound for hostile input
_FAST_BITS = 13  # Huffman fast-table width (covers the fixture books fully)


class EndOfPacket(ValueError):
    """Raised by the bit reader when a read crosses the packet end.
    Subclasses ValueError so an uncaught escape (e.g. a hostile audio
    packet shorter than its mode-number bits) is still a per-row error
    upstream, never a task-killing foreign exception."""


def ilog(x: int) -> int:
    """Vorbis ilog: position of the highest set bit (ilog(0) = 0)."""
    return x.bit_length() if x > 0 else 0


def float32_unpack(x: int) -> float:
    """Vorbis packed float: 21-bit mantissa, 10-bit exponent biased 788."""
    mantissa = x & 0x1FFFFF
    exponent = (x >> 21) & 0x3FF
    value = mantissa * (2.0 ** (exponent - 788))
    return -value if x & 0x80000000 else value


def float32_pack(value: float) -> int:
    """Inverse of ``float32_unpack`` for encoder-chosen constants; raises
    if the value is not exactly representable (fixture constants are)."""
    sign = 0x80000000 if value < 0 else 0
    v = abs(value)
    if v == 0:
        return sign
    mantissa, exponent = v, 788
    while mantissa != int(mantissa):
        mantissa *= 2.0
        exponent -= 1
    mantissa = int(mantissa)
    while mantissa & 1 == 0 and mantissa > 1:
        mantissa >>= 1
        exponent += 1
    if mantissa > 0x1FFFFF or not 0 <= exponent <= 0x3FF:
        raise ValueError(f"{value} not representable as a Vorbis float")
    return sign | (exponent << 21) | mantissa


def lookup1_values(entries: int, dimensions: int) -> int:
    """Largest integer v with v**dimensions <= entries (spec §9.2.3)."""
    v = int(round(entries ** (1.0 / dimensions)))
    while (v + 1) ** dimensions <= entries:
        v += 1
    while v > 0 and v**dimensions > entries:
        v -= 1
    return v


class BitReader:
    """LSb-first bit reader over one packet (spec §2).  Reads index a
    6-byte window at the current byte position, so every read is O(1)
    regardless of packet size (a whole-packet big-int would make each
    read O(packet))."""

    def __init__(self, data: bytes):
        self._data = data
        self._nbits = 8 * len(data)
        self.pos = 0

    def read(self, n: int) -> int:
        pos = self.pos
        if pos + n > self._nbits:
            self.pos = self._nbits
            raise EndOfPacket
        if n > 32:
            lo = self.read(32)
            return lo | (self.read(n - 32) << 32)
        byte_pos = pos >> 3
        window = int.from_bytes(self._data[byte_pos : byte_pos + 6], "little")
        self.pos = pos + n
        return (window >> (pos & 7)) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Up to n bits without advancing; past-end bits read as zero
        (the caller's table lookup then falls through to the bounds-
        checked slow path)."""
        byte_pos = self.pos >> 3
        window = int.from_bytes(self._data[byte_pos : byte_pos + 6], "little")
        return (window >> (self.pos & 7)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        if self.pos + n > self._nbits:
            self.pos = self._nbits
            raise EndOfPacket
        self.pos += n

    def read_bit(self) -> int:
        return self.read(1)


class BitWriter:
    """LSb-first bit writer (encoder side)."""

    def __init__(self) -> None:
        self._val = 0
        self._nbits = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or (n < 64 and value >> n):
            raise ValueError(f"value {value} does not fit in {n} bits")
        self._val |= value << self._nbits
        self._nbits += n

    def write_codeword(self, code: int, length: int) -> None:
        """Huffman codewords transmit MSb first (spec §3.2.1)."""
        for k in range(length - 1, -1, -1):
            self.write((code >> k) & 1, 1)

    def bytes(self) -> bytes:
        return self._val.to_bytes((self._nbits + 7) // 8, "little")


def assign_codewords(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Spec §3.2.1: each used entry gets the lowest-valued unused codeword
    of its length, in entry order.  Returns {entry: (codeword, length)}.
    Free subtrees are tracked explicitly; 'lowest-valued' compares
    codewords left-aligned (MSb-first), which the spec's worked example
    pins in tests.  Raises on an over-populated tree."""
    free: list[tuple[int, int]] = [(0, 0)]  # (prefix, depth)
    out: dict[int, tuple[int, int]] = {}
    used = [e for e, ln in enumerate(lengths) if ln > 0]
    for entry in used:
        ln = lengths[entry]
        if not 1 <= ln <= 32:
            raise ValueError(f"vorbis: codeword length {ln} out of range")
        best = None
        for i, (code, d) in enumerate(free):
            if d <= ln:
                key = code << (32 - d)
                if best is None or key < best[0]:
                    best = (key, i)
        if best is None:
            raise ValueError("vorbis: over-populated Huffman tree")
        code, d = free.pop(best[1])
        w = code << (ln - d)
        out[entry] = (w, ln)
        for dd in range(d + 1, ln + 1):
            free.append(((code << (dd - d)) | 1, dd))
    # single-entry books are legal and under-populated by definition;
    # otherwise require a complete tree (decode would dead-end)
    if len(used) > 1 and free:
        raise ValueError("vorbis: under-populated Huffman tree")
    return out


class Codebook:
    def __init__(
        self,
        dimensions: int,
        lengths: list[int],
        lookup_type: int = 0,
        minimum: float = 0.0,
        delta: float = 0.0,
        sequence_p: int = 0,
        multiplicands: list[int] | None = None,
    ):
        self.dimensions = dimensions
        self.entries = len(lengths)
        self.lengths = lengths
        self.lookup_type = lookup_type
        self.codewords = assign_codewords(lengths)
        self._decode = {(ln, code): e for e, (code, ln) in self.codewords.items()}
        self._maxlen = max((ln for ln in lengths if ln > 0), default=0)
        self._single = None
        used = [e for e, ln in enumerate(lengths) if ln > 0]
        if len(used) == 1:
            self._single = used[0]
        # table-driven fast path: peek FAST_BITS, one list index resolves
        # any codeword of length ≤ FAST_BITS (codewords arrive MSb-first,
        # the LSb-first peek returns them bit-reversed — the table is
        # keyed by the reversed form).  Longer codewords hit the sentinel
        # and fall back to the bit-serial walk.
        self._fast = None
        if self._single is None and self._maxlen:
            fb = _FAST_BITS
            fast = [(-1, 0)] * (1 << fb)
            for e, (code, ln) in self.codewords.items():
                if ln > fb:
                    continue
                rev = int(bin(code)[2:].zfill(ln)[::-1], 2)
                for high in range(1 << (fb - ln)):
                    fast[rev | (high << ln)] = (e, ln)
            self._fast = fast
        if lookup_type == 0:
            self.vectors = None
            return
        mult = np.asarray(multiplicands, dtype=np.float64)
        if lookup_type == 1:
            lv = lookup1_values(self.entries, dimensions)
            vecs = np.zeros((self.entries, dimensions))
            for e in range(self.entries):
                last = 0.0
                divisor = 1
                for d in range(dimensions):
                    off = (e // divisor) % lv
                    vecs[e, d] = mult[off] * delta + minimum + last
                    if sequence_p:
                        last = vecs[e, d]
                    divisor *= lv
        elif lookup_type == 2:
            vecs = np.zeros((self.entries, dimensions))
            for e in range(self.entries):
                last = 0.0
                for d in range(dimensions):
                    vecs[e, d] = mult[e * dimensions + d] * delta + minimum + last
                    if sequence_p:
                        last = vecs[e, d]
        else:
            raise ValueError(f"vorbis: reserved lookup type {lookup_type}")
        self.vectors = vecs

    def decode_scalar(self, br: BitReader) -> int:
        if self._single is not None:
            # a one-entry book decodes with a single stream bit (the only
            # codeword is '0'); tolerate either bit value like libvorbis
            br.read_bit()
            return self._single
        if self._fast is not None:
            e, ln = self._fast[br.peek(_FAST_BITS)]
            if e >= 0:
                br.skip(ln)  # raises EndOfPacket if the match overran
                return e
        acc = 0
        for ln in range(1, self._maxlen + 1):
            acc = (acc << 1) | br.read_bit()
            e = self._decode.get((ln, acc))
            if e is not None:
                return e
        raise ValueError("vorbis: invalid Huffman codeword")

    def decode_vector(self, br: BitReader) -> np.ndarray:
        if self.vectors is None:
            raise ValueError("vorbis: scalar-context book used in VQ context")
        return self.vectors[self.decode_scalar(br)]


def unpack_codebook(br: BitReader) -> Codebook:
    if br.read(24) != 0x564342:  # 'BCV'
        raise ValueError("vorbis: codebook sync lost")
    dimensions = br.read(16)
    entries = br.read(24)
    if entries > _MAX_ENTRIES or dimensions * max(entries, 1) > _MAX_ENTRIES * 4:
        raise ValueError(f"vorbis: codebook too large ({entries}x{dimensions})")
    ordered = br.read_bit()
    lengths = [0] * entries
    if not ordered:
        sparse = br.read_bit()
        for e in range(entries):
            if sparse and not br.read_bit():
                continue
            lengths[e] = br.read(5) + 1
    else:
        current_entry = 0
        current_length = br.read(5) + 1
        while current_entry < entries:
            number = br.read(ilog(entries - current_entry))
            if current_entry + number > entries:
                raise ValueError("vorbis: ordered codebook overflows entries")
            for e in range(current_entry, current_entry + number):
                lengths[e] = current_length
            current_entry += number
            current_length += 1
            if current_length > 32:
                raise ValueError("vorbis: ordered codebook length overflow")
    lookup_type = br.read(4)
    if lookup_type == 0:
        return Codebook(dimensions, lengths)
    if lookup_type not in (1, 2):
        raise ValueError(f"vorbis: reserved lookup type {lookup_type}")
    minimum = float32_unpack(br.read(32))
    delta = float32_unpack(br.read(32))
    value_bits = br.read(4) + 1
    sequence_p = br.read_bit()
    if lookup_type == 1:
        if dimensions == 0:
            raise ValueError("vorbis: lookup-1 book with zero dimensions")
        n_mult = lookup1_values(entries, dimensions)
    else:
        n_mult = entries * dimensions
    multiplicands = [br.read(value_bits) for _ in range(n_mult)]
    return Codebook(
        dimensions, lengths, lookup_type, minimum, delta, sequence_p, multiplicands
    )


# --------------------------------------------------------------- floor 1

_RANGES = (256, 128, 86, 64)
FLOOR1_INVERSE_DB = np.array(
    [10.0 ** ((i - 255) * 7.0 / 256.0) for i in range(256)]
)


def _render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    dy = y1 - y0
    adx = x1 - x0
    err = abs(dy) * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0: int, y0: int, x1: int, y1: int, v: np.ndarray) -> None:
    """Spec §9.2.7 Bresenham render into v[x0:x1] (integer y values)."""
    dy = y1 - y0
    adx = x1 - x0
    base = int(dy / adx)  # truncation toward zero, per spec
    sy = base - 1 if dy < 0 else base + 1
    ady = abs(dy) - abs(base) * adx
    n = len(v)
    if x0 < n:
        v[x0] = y0
    y, err = y0, 0
    for x in range(x0 + 1, min(x1, n)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


class Floor1:
    def __init__(self, br: BitReader, codebooks: list[Codebook]):
        partitions = br.read(5)
        self.partition_class = [br.read(4) for _ in range(partitions)]
        maximum_class = max(self.partition_class, default=-1)
        self.class_dims: list[int] = []
        self.class_subclass_bits: list[int] = []
        self.class_masterbook: list[int] = []
        self.subclass_books: list[list[int]] = []
        for _ in range(maximum_class + 1):
            dim = br.read(3) + 1
            sub_bits = br.read(2)
            master = br.read(8) if sub_bits else -1
            if master >= len(codebooks):
                raise ValueError("vorbis: floor1 masterbook out of range")
            books = []
            for _ in range(1 << sub_bits):
                b = br.read(8) - 1
                if b >= len(codebooks):
                    raise ValueError("vorbis: floor1 subclass book out of range")
                books.append(b)
            self.class_dims.append(dim)
            self.class_subclass_bits.append(sub_bits)
            self.class_masterbook.append(master)
            self.subclass_books.append(books)
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        xs = [0, 1 << rangebits]
        for cls in self.partition_class:
            for _ in range(self.class_dims[cls]):
                xs.append(br.read(rangebits))
        if len(set(xs)) != len(xs):
            raise ValueError("vorbis: floor1 X values not unique")
        if len(xs) > 65:
            raise ValueError("vorbis: floor1 has more than 65 points")
        self.x_list = xs
        # sorted point order, reused every packet
        self.sort_idx = sorted(range(len(xs)), key=lambda i: xs[i])
        self.codebooks = codebooks

    def decode(self, br: BitReader) -> tuple[list[int], list[bool]] | None:
        """Packet-side decode → (final_Y, step2 flags), or None for an
        unaudible channel.  step2 travels WITH the result: curves are
        rendered after every channel has decoded, and a shared Floor1
        object must not leak one channel's flags into another's curve."""
        if not br.read_bit():
            return None
        rng = _RANGES[self.multiplier - 1]
        ybits = ilog(rng - 1)
        ys = [br.read(ybits), br.read(ybits)]
        for cls in self.partition_class:
            cbits = self.class_subclass_bits[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = self.codebooks[self.class_masterbook[cls]].decode_scalar(br)
            for _ in range(self.class_dims[cls]):
                book = self.subclass_books[cls][cval & csub]
                cval >>= cbits
                ys.append(
                    self.codebooks[book].decode_scalar(br) if book >= 0 else 0
                )
        # amplitude synthesis step 1 (§7.2.4): prediction + residual
        final_y = [ys[0], ys[1]]
        step2 = [True, True]
        xs = self.x_list
        for i in range(2, len(xs)):
            lo = max(
                (j for j in range(i) if xs[j] < xs[i]), key=lambda j: xs[j]
            )
            hi = min(
                (j for j in range(i) if xs[j] > xs[i]), key=lambda j: xs[j]
            )
            predicted = _render_point(
                xs[lo], final_y[lo], xs[hi], final_y[hi], xs[i]
            )
            val = ys[i]
            highroom = rng - predicted
            lowroom = predicted
            room = 2 * min(highroom, lowroom)
            if val:
                step2[lo] = step2[hi] = True
                step2.append(True)
                if val >= room:
                    fy = (
                        val - lowroom + predicted
                        if highroom > lowroom
                        else predicted - (val - highroom) - 1
                    )
                elif val & 1:
                    fy = predicted - ((val + 1) >> 1)
                else:
                    fy = predicted + (val >> 1)
            else:
                step2.append(False)
                fy = predicted
            final_y.append(max(0, min(rng - 1, fy)))
        return final_y, step2

    def curve(self, final_y: list[int], step2: list[bool], n: int) -> np.ndarray:
        """Synthesis step 2: render the piecewise line, map through the
        inverse-dB table; n = half the block size."""
        fy = np.zeros(n, dtype=np.int64)
        lx, ly = 0, final_y[self.sort_idx[0]] * self.multiplier
        hx = 0
        for i in self.sort_idx[1:]:
            if not step2[i]:
                continue
            hx = self.x_list[i]
            hy = final_y[i] * self.multiplier
            if hx > lx:
                _render_line(lx, ly, hx, hy, fy)
            lx, ly = hx, hy
        if hx < n:
            fy[hx:] = ly
        np.clip(fy, 0, 255, out=fy)
        return FLOOR1_INVERSE_DB[fy]


# --------------------------------------------------------------- residue

class Residue:
    def __init__(self, rtype: int, br: BitReader, codebooks: list[Codebook]):
        self.rtype = rtype
        self.begin = br.read(24)
        self.end = br.read(24)
        self.partition_size = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        if self.classbook >= len(codebooks):
            raise ValueError("vorbis: residue classbook out of range")
        cb = codebooks[self.classbook]
        if self.classifications**cb.dimensions > cb.entries:
            raise ValueError("vorbis: residue classbook too small")
        cascades = []
        for _ in range(self.classifications):
            low = br.read(3)
            high = br.read(5) if br.read_bit() else 0
            cascades.append((high << 3) | low)
        self.books: list[list[int]] = []
        for cascade in cascades:
            row = []
            for stage in range(8):
                if cascade & (1 << stage):
                    b = br.read(8)
                    if b >= len(codebooks) or codebooks[b].vectors is None:
                        raise ValueError("vorbis: residue book invalid")
                    row.append(b)
                else:
                    row.append(-1)
            self.books.append(row)
        self.codebooks = codebooks

    def decode(
        self, br: BitReader, do_decode: list[bool], vec_size: int
    ) -> np.ndarray:
        """§8.6.2: returns array (n_channels, vec_size).  For type 2 the
        caller passes one pseudo-channel of the interleaved size."""
        ch = len(do_decode)
        out = np.zeros((ch, vec_size))
        limit_begin = min(self.begin, vec_size)
        limit_end = min(self.end, vec_size)
        n_to_read = limit_end - limit_begin
        if n_to_read <= 0 or not any(do_decode):
            return out
        ptr = n_to_read // self.partition_size
        classbook = self.codebooks[self.classbook]
        cw = classbook.dimensions
        classifs = np.zeros((ch, ptr + cw), dtype=np.int64)
        try:
            for p in range(8):
                pc = 0
                while pc < ptr:
                    if p == 0:
                        for j in range(ch):
                            if not do_decode[j]:
                                continue
                            temp = classbook.decode_scalar(br)
                            for i in range(cw - 1, -1, -1):
                                classifs[j, pc + i] = (
                                    temp % self.classifications
                                )
                                temp //= self.classifications
                    for _ in range(cw):
                        if pc >= ptr:
                            break
                        for j in range(ch):
                            if not do_decode[j]:
                                continue
                            book = self.books[classifs[j, pc]][p]
                            if book < 0:
                                continue
                            self._partition(
                                br,
                                self.codebooks[book],
                                out[j],
                                limit_begin + pc * self.partition_size,
                            )
                        pc += 1
        except EndOfPacket:
            # spec §1.3.2/§8.6.2 end-of-packet rule (libvorbis parity):
            # a truncated packet keeps the residue decoded so far; only
            # the un-decoded remainder stays zero
            pass
        return out

    def _partition(
        self, br: BitReader, book: Codebook, v: np.ndarray, offset: int
    ) -> None:
        psz = self.partition_size
        dim = book.dimensions
        fast = book._fast
        if dim == 1 and fast is not None:
            # hot path for scalar books (the fixture shape and a common
            # real-encoder shape): resolve every codeword in the partition
            # through the fast table with localized reads, one vectorized
            # add at the end.  A table miss (codeword longer than
            # _FAST_BITS) rewinds and takes the general path.
            peek, skip = br.peek, br.skip
            vecs = book.vectors[:, 0]
            pos0 = br.pos
            idx = np.empty(psz, dtype=np.intp)
            for t in range(psz):
                e, ln = fast[peek(_FAST_BITS)]
                if e < 0:
                    br.pos = pos0
                    break
                skip(ln)
                idx[t] = e
            else:
                v[offset : offset + psz] += vecs[idx]
                return
        if self.rtype == 0:
            # interleaved: step vectors, stride step
            step = psz // dim
            for j in range(step):
                vec = book.decode_vector(br)
                v[offset + j : offset + j + dim * step : step] += vec
        else:
            # types 1 and 2: sequential vector adds
            for t in range(psz // dim):
                vec = book.decode_vector(br)
                v[offset + t * dim : offset + (t + 1) * dim] += vec


# --------------------------------------------------------- mapping / mode

class Mapping:
    def __init__(self, br: BitReader, channels: int, n_floors: int, n_residues: int):
        self.submaps = br.read(4) + 1 if br.read_bit() else 1
        self.coupling: list[tuple[int, int]] = []
        if br.read_bit():
            steps = br.read(8) + 1
            bits = ilog(channels - 1)
            for _ in range(steps):
                m = br.read(bits)
                a = br.read(bits)
                if m == a or m >= channels or a >= channels:
                    raise ValueError("vorbis: invalid coupling step")
                self.coupling.append((m, a))
        if br.read(2) != 0:
            raise ValueError("vorbis: mapping reserved bits nonzero")
        if self.submaps > 1:
            self.mux = [br.read(4) for _ in range(channels)]
            if any(m >= self.submaps for m in self.mux):
                raise ValueError("vorbis: mapping mux out of range")
        else:
            self.mux = [0] * channels
        self.submap_floor: list[int] = []
        self.submap_residue: list[int] = []
        for _ in range(self.submaps):
            br.read(8)  # unused time configuration
            f = br.read(8)
            r = br.read(8)
            if f >= n_floors or r >= n_residues:
                raise ValueError("vorbis: submap floor/residue out of range")
            self.submap_floor.append(f)
            self.submap_residue.append(r)


class Mode:
    def __init__(self, br: BitReader, n_mappings: int):
        self.blockflag = br.read_bit()
        if br.read(16) != 0 or br.read(16) != 0:
            raise ValueError("vorbis: nonzero window/transform type")
        self.mapping = br.read(8)
        if self.mapping >= n_mappings:
            raise ValueError("vorbis: mode mapping out of range")


# --------------------------------------------------------------- windows

def _slope(t: np.ndarray) -> np.ndarray:
    return np.sin(0.5 * np.pi * np.sin(t) ** 2)


def vorbis_window(n: int, bs0: int, prev_flag: int, next_flag: int, long: bool):
    """Window for one block (§4.3.1): full slopes for short blocks, slopes
    narrowed to the short size on long blocks adjacent to short ones."""
    w = np.zeros(n)
    if long and not prev_flag:
        left_start, left_size = n // 4 - bs0 // 4, bs0 // 2
    else:
        left_start, left_size = 0, n // 2
    if long and not next_flag:
        right_start, right_size = 3 * n // 4 - bs0 // 4, bs0 // 2
    else:
        right_start, right_size = n // 2, n // 2
    i = np.arange(left_size)
    w[left_start : left_start + left_size] = _slope(
        (i + 0.5) / left_size * (np.pi / 2)
    )
    w[left_start + left_size : right_start] = 1.0
    i = np.arange(right_size)
    w[right_start : right_start + right_size] = _slope(
        (i + 0.5) / right_size * (np.pi / 2) + np.pi / 2
    )
    return w


_IMDCT_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def imdct(spectrum: np.ndarray) -> np.ndarray:
    """Spec §4.3.6: y[j] = Σ_k X[k]·cos(π/(2N)·(2j+1+N/2)·(2k+1)), N = 2·len(X).
    Computed as an N-point IFFT with pre/post twiddles; the direct formula
    pins this in tests at several sizes."""
    n = 2 * len(spectrum)
    tw = _IMDCT_CACHE.get(n)
    if tw is None:
        k = np.arange(n // 2)
        pre = np.exp(1j * np.pi * k * (1 + n / 2) / n)
        j = np.arange(n)
        post = np.exp(1j * np.pi * (2 * j + 1 + n / 2) / (2 * n))
        tw = (pre, post)
        _IMDCT_CACHE[n] = tw
    pre, post = tw
    v = np.fft.ifft(spectrum * pre, n=n) * n
    return np.real(post * v)


def imdct_direct(spectrum: np.ndarray) -> np.ndarray:
    """O(N²) literal spec formula — the test oracle for ``imdct``."""
    n = 2 * len(spectrum)
    j = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    c = np.cos(np.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1))
    return c @ spectrum


# --------------------------------------------------------------- decoder

class VorbisDecoder:
    def __init__(self) -> None:
        self._headers = 0
        self.channels = 0
        self.rate = 0
        self.blocksizes = (0, 0)
        self.codebooks: list[Codebook] = []
        self.floors: list[Floor1] = []
        self.residues: list[Residue] = []
        self.mappings: list[Mapping] = []
        self.modes: list[Mode] = []

    # -- headers --
    def header_packet(self, pkt: bytes) -> None:
        if len(pkt) < 7 or pkt[1:7] != b"vorbis":
            raise ValueError("vorbis: bad header packet signature")
        kind = pkt[0]
        br = BitReader(pkt[7:])
        if kind == 1:
            self._id_header(br)
        elif kind == 3:
            pass  # comment header carries no decode state
        elif kind == 5:
            self._setup_header(br)
        else:
            raise ValueError(f"vorbis: unexpected header type {kind}")
        self._headers += 1

    def _id_header(self, br: BitReader) -> None:
        if br.read(32) != 0:
            raise ValueError("vorbis: unsupported version")
        self.channels = br.read(8)
        self.rate = br.read(32)
        br.read(32), br.read(32), br.read(32)  # bitrate max/nominal/min
        bs0 = 1 << br.read(4)
        bs1 = 1 << br.read(4)
        ok = (
            self.channels >= 1
            and self.rate >= 1
            and 64 <= bs0 <= bs1 <= 8192
        )
        if not ok or not br.read_bit():
            raise ValueError("vorbis: invalid identification header")
        self.blocksizes = (bs0, bs1)

    def _setup_header(self, br: BitReader) -> None:
        if not self.channels:
            raise ValueError("vorbis: setup header before identification")
        for _ in range(br.read(8) + 1):
            self.codebooks.append(unpack_codebook(br))
        for _ in range(br.read(6) + 1):  # time transforms (placeholders)
            if br.read(16) != 0:
                raise ValueError("vorbis: nonzero time transform")
        for _ in range(br.read(6) + 1):
            ftype = br.read(16)
            if ftype == 1:
                self.floors.append(Floor1(br, self.codebooks))
            elif ftype == 0:
                raise NotImplementedError(
                    "vorbis: floor type 0 (legacy LSP) not implemented — "
                    "modern encoders emit floor 1 exclusively"
                )
            else:
                raise ValueError(f"vorbis: reserved floor type {ftype}")
        for _ in range(br.read(6) + 1):
            rtype = br.read(16)
            if rtype not in (0, 1, 2):
                raise ValueError(f"vorbis: reserved residue type {rtype}")
            self.residues.append(Residue(rtype, br, self.codebooks))
        for _ in range(br.read(6) + 1):
            if br.read(16) != 0:
                raise ValueError("vorbis: reserved mapping type")
            self.mappings.append(
                Mapping(br, self.channels, len(self.floors), len(self.residues))
            )
        for _ in range(br.read(6) + 1):
            self.modes.append(Mode(br, len(self.mappings)))
        if not br.read_bit():
            raise ValueError("vorbis: setup framing bit unset")

    # -- audio --
    def decode_audio_packet(self, pkt: bytes) -> tuple[np.ndarray, int, int, int]:
        """→ (windowed time frames (ch, n), n, prev_flag, next_flag); the
        frame is already windowed, ready for center-aligned overlap-add."""
        br = BitReader(pkt)
        if br.read_bit() != 0:
            raise ValueError("vorbis: not an audio packet")
        mode = self.modes[br.read(ilog(len(self.modes) - 1))]
        mapping = self.mappings[mode.mapping]
        bs0, bs1 = self.blocksizes
        n = bs1 if mode.blockflag else bs0
        prev_flag = next_flag = 1
        if mode.blockflag:
            prev_flag = br.read_bit()
            next_flag = br.read_bit()
        ch = self.channels
        half = n // 2
        floor_y: list = [(None, None)] * ch
        residue_vec = np.zeros((ch, half))
        try:
            for c in range(ch):
                fl = self.floors[mapping.submap_floor[mapping.mux[c]]]
                floor_y[c] = (fl, fl.decode(br))
            no_residue = [dec is None for _, dec in floor_y]
            for m, a in mapping.coupling:
                if not (no_residue[m] and no_residue[a]):
                    no_residue[m] = no_residue[a] = False
            for s in range(mapping.submaps):
                res = self.residues[mapping.submap_residue[s]]
                chans = [c for c in range(ch) if mapping.mux[c] == s]
                if res.rtype == 2:
                    if not all(no_residue[c] for c in chans):
                        inter = res.decode(br, [True], half * len(chans))[0]
                        for i, c in enumerate(chans):
                            residue_vec[c] = inter[i :: len(chans)]
                else:
                    dd = [not no_residue[c] for c in chans]
                    dec = res.decode(br, dd, half)
                    for i, c in enumerate(chans):
                        residue_vec[c] = dec[i]
        except EndOfPacket:
            # spec end-of-packet rule (§4.3, libvorbis/stb_vorbis parity):
            # KEEP everything decoded before truncation — floor curves of
            # earlier channels render against their (possibly partial)
            # residues — and only the un-decoded remainder is silence.
            # Channels whose floor never decoded stay (None, None) → muted;
            # Residue.decode catches its own EndOfPacket and returns the
            # partial vector, so a mid-residue cut keeps earlier partitions.
            pass
        # inverse coupling (§4.3.5, square polar)
        for m, a in reversed(mapping.coupling):
            mag = residue_vec[m].copy()
            ang = residue_vec[a].copy()
            pos_m = mag > 0
            pos_a = ang > 0
            new_m = np.where(
                pos_m,
                np.where(pos_a, mag, mag + ang),
                np.where(pos_a, mag, mag - ang),
            )
            new_a = np.where(
                pos_m,
                np.where(pos_a, mag - ang, mag),
                np.where(pos_a, mag + ang, mag),
            )
            residue_vec[m] = new_m
            residue_vec[a] = new_a
        frames = np.zeros((ch, n))
        window = vorbis_window(n, bs0, prev_flag, next_flag, bool(mode.blockflag))
        for c in range(ch):
            fl, dec = floor_y[c]
            if dec is None:
                continue
            spectrum = fl.curve(dec[0], dec[1], half) * residue_vec[c]
            frames[c] = imdct(spectrum) * window
        return frames, n, prev_flag, next_flag


class OverlapAdder:
    """Center-aligned overlap-add across (possibly mixed-size) windowed
    frames (§1.3.2): each frame emits the samples between the previous
    window's center and its own — (prev_n + n)/4 samples.  The previous
    windowed tail is zero beyond that boundary by the window shape, so the
    running state is just the latest right half."""

    def __init__(self) -> None:
        self._tail: np.ndarray | None = None
        self._prev_n = 0

    def add(self, frames: np.ndarray) -> np.ndarray | None:
        n = frames.shape[1]
        if self._tail is None:
            self._tail = frames[:, n // 2 :]
            self._prev_n = n
            return None
        prev_n = self._prev_n
        emit_len = (prev_n + n) // 4
        out = np.zeros((frames.shape[0], emit_len))
        m = min(emit_len, prev_n // 2)
        out[:, :m] += self._tail[:, :m]
        rel = prev_n // 4 - n // 4  # current frame start vs previous center
        if rel >= 0:
            out[:, rel:emit_len] += frames[:, : emit_len - rel]
        else:
            out[:, :emit_len] += frames[:, -rel : -rel + emit_len]
        self._tail = frames[:, n // 2 :]
        self._prev_n = n
        return out


def decode_ogg_vorbis(payload: bytes) -> tuple[np.ndarray, int]:
    """Ogg/Vorbis bytes → (mono int16 PCM, sample_rate), matching
    ``multimodal.decode_audio``'s WAV/FLAC contract (multi-channel
    downmixes by channel mean).  Granule position of the final page
    truncates the synthesized tail (§A.2)."""
    dec = VorbisDecoder()
    chunks: list[np.ndarray] = []
    ola = OverlapAdder()
    final_granule = -1
    for pkt, granule in iter_ogg_packets(payload):
        if dec._headers < 3:
            dec.header_packet(pkt)
            continue
        if not pkt:
            continue
        frames, _n, _pf, _nf = dec.decode_audio_packet(pkt)
        out = ola.add(frames)
        if out is not None:
            chunks.append(out)
        if granule >= 0:
            final_granule = granule
    if dec._headers < 3:
        raise ValueError("vorbis: stream ends before the three headers")
    if not chunks:
        return np.zeros(0, dtype=np.int16), dec.rate
    pcm = np.concatenate(chunks, axis=1)
    if 0 <= final_granule < pcm.shape[1]:
        pcm = pcm[:, :final_granule]
    mono = pcm.mean(axis=0) if dec.channels > 1 else pcm[0]
    return (
        np.clip(np.rint(mono * 32768.0), -32768, 32767).astype(np.int16),
        dec.rate,
    )


# --------------------------------------------------------------- encoder
#
# Fixture encoder: one 256-sample block size, flat unit floor (floor1 with
# zero partitions), scalar quantization on a 0.125 grid carried by a
# dims=1 lookup-type-2 book, stereo via square-polar coupling + residue
# type 2.  Real, spec-conformant output — any conformant decoder plays it.

_BS = 256  # fixture block size (both blocksizes; blockflag stays 0)
_HOP = _BS // 2
Q_MIN, Q_DELTA, Q_LEVELS = -8.0, 1.0 / 256.0, 4097
_ZQ = 2048  # quantized zero: Q_MIN + 2048 * Q_DELTA == 0.0 exactly
_PSZ = 8  # residue partition size
# flat floor level: spectrum = gain · residue, so residue levels carry
# coefficient/gain — an effective grid of Q_DELTA·gain ≈ 2.4e-4 on the
# coefficients themselves while staying inside the ±8 book range
_FLOOR_Y = 211
FLOOR_GAIN = float(FLOOR1_INVERSE_DB[_FLOOR_Y])

# classbook: dims=2 over 2 classifications → 4 entries, flat lengths
_CLASS_LENGTHS = [2, 2, 2, 2]
# value book: 4097 entries; Kraft-complete as 4095×len-12 + 2×len-13
_VALUE_LENGTHS = [12] * 4095 + [13, 13]

_FWD_CACHE: dict[int, np.ndarray] = {}


def _forward_mdct(t: np.ndarray) -> np.ndarray:
    """Analysis MDCT matched to the spec IMDCT: X = (4/N)·C·t with
    C[k,j] = cos(π/(2N)(2j+1+N/2)(2k+1)); the 4/N scale makes
    window→MDCT→IMDCT→window→overlap-add the identity (TDAC), which the
    round-trip test pins."""
    n = len(t)
    m = _FWD_CACHE.get(n)
    if m is None:
        j = np.arange(n)[None, :]
        k = np.arange(n // 2)[:, None]
        m = np.cos(np.pi / (2 * n) * (2 * j + 1 + n / 2) * (2 * k + 1)) * (4.0 / n)
        _FWD_CACHE[n] = m
    return m @ t


def quantize_levels(coeffs: np.ndarray) -> np.ndarray:
    """Float coefficients → integer book levels: levels carry coeff/gain
    on the Q_DELTA grid; raises if the fixture signal exceeds the
    quantizer range (a fixture bug must be loud, not a silent clip)."""
    q = np.rint(coeffs / (Q_DELTA * FLOOR_GAIN)).astype(np.int64) + _ZQ
    if q.min() < 0 or q.max() >= Q_LEVELS:
        raise ValueError(
            "vorbis fixture: coefficient outside the quantizer range "
            f"[{Q_MIN}, {-Q_MIN}] — lower the signal amplitude"
        )
    return q


def dequantize(q: np.ndarray) -> np.ndarray:
    """Levels → the spectrum the decoder reconstructs (floor gain applied)."""
    return (q - _ZQ) * Q_DELTA * FLOOR_GAIN


def couple_levels(qx: np.ndarray, qy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Forward square-polar coupling on grid levels (inverse of §4.3.5):
    magnitude = the signed max (min when both non-positive), angle = the
    signed difference, both staying on the grid so the round-trip is
    quantization-exact.  Inverting with the decoder's table returns
    (qx, qy) identically — pinned by a property test."""
    x = qx - _ZQ
    y = qy - _ZQ
    pos = np.maximum(x, y) > 0
    m = np.where(pos, np.maximum(x, y), np.minimum(x, y))
    a = np.where(pos, x - y, y - x)
    return m + _ZQ, a + _ZQ


def _write_codebook_scalar(bw: BitWriter, dims: int, lengths: list[int]) -> None:
    bw.write(0x564342, 24)
    bw.write(dims, 16)
    bw.write(len(lengths), 24)
    bw.write(0, 1)  # not ordered
    bw.write(0, 1)  # not sparse
    for ln in lengths:
        bw.write(ln - 1, 5)
    bw.write(0, 4)  # lookup type 0


def _write_codebook_value(bw: BitWriter) -> None:
    bw.write(0x564342, 24)
    bw.write(1, 16)  # dims
    bw.write(Q_LEVELS, 24)
    bw.write(0, 1)
    bw.write(0, 1)
    for ln in _VALUE_LENGTHS:
        bw.write(ln - 1, 5)
    bw.write(2, 4)  # lookup type 2
    bw.write(float32_pack(Q_MIN), 32)
    bw.write(float32_pack(Q_DELTA), 32)
    bw.write(13 - 1, 4)  # value_bits
    bw.write(0, 1)  # sequence_p
    for e in range(Q_LEVELS):
        bw.write(e, 13)  # multiplicand e → Q_MIN + e·Q_DELTA


def _header_packet(kind: int, body: BitWriter) -> bytes:
    return bytes([kind]) + b"vorbis" + body.bytes()


def _id_header(channels: int, rate: int) -> bytes:
    bw = BitWriter()
    bw.write(0, 32)
    bw.write(channels, 8)
    bw.write(rate, 32)
    for _ in range(3):
        bw.write(0, 32)  # bitrate max / nominal / min
    log_bs = _BS.bit_length() - 1
    bw.write(log_bs, 4)  # blocksize_0
    bw.write(log_bs, 4)  # blocksize_1
    bw.write(1, 1)  # framing
    return _header_packet(1, bw)


def _comment_header() -> bytes:
    bw = BitWriter()
    vendor = b"tableextraction_spark vorbis fixture"
    bw.write(len(vendor), 32)
    for b in vendor:
        bw.write(b, 8)
    bw.write(0, 32)  # user comment count
    bw.write(1, 1)  # framing
    return _header_packet(3, bw)


def _setup_header(channels: int) -> bytes:
    bw = BitWriter()
    bw.write(2 - 1, 8)  # two codebooks
    _write_codebook_scalar(bw, 2, _CLASS_LENGTHS)  # book 0: classbook
    _write_codebook_value(bw)  # book 1: value book
    bw.write(0, 6)  # one time transform
    bw.write(0, 16)
    bw.write(0, 6)  # one floor
    bw.write(1, 16)  # floor type 1
    bw.write(0, 5)  # zero partitions → flat two-point floor
    bw.write(0, 2)  # multiplier - 1
    bw.write(8, 4)  # rangebits → X = [0, 256]
    bw.write(0, 6)  # one residue
    bw.write(2 if channels > 1 else 1, 16)  # residue type
    bw.write(0, 24)  # begin
    bw.write(channels * _HOP, 24)  # end
    bw.write(_PSZ - 1, 24)
    bw.write(2 - 1, 6)  # classifications
    bw.write(0, 8)  # classbook index
    bw.write(0, 3)  # class 0: cascade 0 (silent partitions)
    bw.write(0, 1)
    bw.write(1, 3)  # class 1: cascade 1 → pass-0 value book
    bw.write(0, 1)
    bw.write(1, 8)  # class 1, pass 0 → book 1
    bw.write(0, 6)  # one mapping
    bw.write(0, 16)  # mapping type 0
    bw.write(0, 1)  # square submaps flag
    if channels > 1:
        bw.write(1, 1)  # coupling flag
        bw.write(0, 8)  # steps - 1
        bw.write(0, ilog(channels - 1))  # magnitude channel
        bw.write(1, ilog(channels - 1))  # angle channel
    else:
        bw.write(0, 1)
    bw.write(0, 2)  # reserved
    bw.write(0, 8)  # submap time config (unused)
    bw.write(0, 8)  # submap floor
    bw.write(0, 8)  # submap residue
    bw.write(0, 6)  # one mode
    bw.write(0, 1)  # blockflag
    bw.write(0, 16)  # window type
    bw.write(0, 16)  # transform type
    bw.write(0, 8)  # mapping
    bw.write(1, 1)  # framing
    return _header_packet(5, bw)


def _audio_packet(
    vec: np.ndarray, channels: int, classbook: Codebook, valuebook: Codebook
) -> bytes:
    """One audio packet: flat-max floor per channel + the residue vector
    (interleaved (M,A) levels for stereo type 2, plain levels for mono),
    emitted in the exact interleave the decode loop consumes."""
    bw = BitWriter()
    bw.write(0, 1)  # packet type: audio (mode number is 0 bits — one mode)
    for _ in range(channels):
        bw.write(1, 1)  # floor nonzero
        bw.write(_FLOOR_Y, 8)  # y0 → flat gain FLOOR_GAIN
        bw.write(_FLOOR_Y, 8)  # y1
    nparts = len(vec) // _PSZ
    classes = [
        1 if np.any(vec[p * _PSZ : (p + 1) * _PSZ] != _ZQ) else 0
        for p in range(nparts)
    ]
    pc = 0
    while pc < nparts:
        entry = classes[pc] * 2 + classes[pc + 1]
        code, ln = classbook.codewords[entry]
        bw.write_codeword(code, ln)
        for i in (pc, pc + 1):
            if classes[i]:
                for val in vec[i * _PSZ : (i + 1) * _PSZ]:
                    code, ln = valuebook.codewords[int(val)]
                    bw.write_codeword(code, ln)
        pc += 2
    return bw.bytes()


def encode_vorbis_ogg(
    pcm: np.ndarray,
    sample_rate: int,
    *,
    serial: int = 0x5649,
    max_segments: int = 255,
) -> bytes:
    """int16 PCM (shape (n,) mono or (2, n) stereo) → real Ogg/Vorbis
    bytes.  Lossy only through 0.125-grid coefficient quantization; the
    expected decode is the synthesis of the same quantized spectrum
    (``expected_synthesis``), which tests compute independently."""
    if pcm.dtype != np.int16:
        raise ValueError(f"expected int16 PCM, got {pcm.dtype}")
    x = np.atleast_2d(pcm).astype(np.float64) / 32768.0
    channels, total = x.shape
    if channels not in (1, 2):
        raise ValueError(f"fixture encoder handles 1-2 channels, got {channels}")
    if total == 0:
        raise ValueError("empty PCM")
    q_frames = _quantized_frames(x)
    classbook = Codebook(2, _CLASS_LENGTHS)
    valuebook = Codebook(1, list(_VALUE_LENGTHS))
    w = OggWriter(serial, max_segments=max_segments)
    w.write_packet(_id_header(channels, sample_rate), 0, flush_after=True)
    w.write_packet(_comment_header(), 0)
    w.write_packet(_setup_header(channels), 0, flush_after=True)
    for f, vec in enumerate(q_frames):
        if channels > 1:
            qm, qa = couple_levels(vec[0], vec[1])
            flat = np.empty(2 * _HOP, dtype=np.int64)
            flat[0::2] = qm
            flat[1::2] = qa
        else:
            flat = vec[0]
        granule = min(f * _HOP, total)
        w.write_packet(_audio_packet(flat, channels, classbook, valuebook), granule)
    return w.close(total)


def _quantized_frames(x: np.ndarray) -> list[np.ndarray]:
    """Per frame: windowed slice → forward MDCT → grid levels, per channel.
    Frame f covers xpad[f·hop : f·hop+bs] with hop zeros of lead-in, so the
    decoder's emitted sample t is exactly x[t] (TDAC)."""
    channels, total = x.shape
    n_frames = -(-total // _HOP) + 1
    xpad = np.zeros((channels, (n_frames + 1) * _HOP))
    xpad[:, _HOP : _HOP + total] = x
    win = vorbis_window(_BS, _BS, 1, 1, False)
    out = []
    for f in range(n_frames):
        sl = xpad[:, f * _HOP : f * _HOP + _BS]
        out.append(
            np.stack([quantize_levels(_forward_mdct(win * sl[c])) for c in range(channels)])
        )
    return out


def expected_synthesis(payload_pcm: np.ndarray) -> np.ndarray:
    """The decoder-independent oracle: run the ENCODER's analysis, then
    synthesize with the direct-formula IMDCT and plain overlap-add —
    no decoder code involved.  Returns float PCM in [-1, 1)."""
    x = np.atleast_2d(payload_pcm).astype(np.float64) / 32768.0
    channels, total = x.shape
    q_frames = _quantized_frames(x)
    win = vorbis_window(_BS, _BS, 1, 1, False)
    acc = np.zeros((channels, (len(q_frames) + 1) * _HOP))
    for f, q in enumerate(q_frames):
        for c in range(channels):
            acc[c, f * _HOP : f * _HOP + _BS] += imdct_direct(dequantize(q[c])) * win
    return acc[:, _HOP : _HOP + total]

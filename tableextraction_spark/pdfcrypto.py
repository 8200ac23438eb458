"""PDF standard security handler — RC4 + AES from scratch (no crypto lib).

Scanned-document archives very commonly ship *permissions-encrypted* PDFs:
the user password is EMPTY (any reader can open them) but every stream is
RC4- or AES-encrypted under a key derived from the document's /Encrypt
dictionary (ISO 32000-1 §7.6, "standard security handler").  This module
implements that handler for the empty-user-password case:

- revisions 2/3 (RC4-40 / RC4-128, /V 1-2),
- revision 4 (/V 4 crypt filters: /AESV2 AES-128-CBC, /V2 RC4),
- revision 6 (/V 5 /AESV3, AES-256-CBC with the SHA-2 iterated hash).

A non-empty user password (authentication fails) raises a named
ValueError — a per-row error upstream, never silently-garbled pages.

Primitives are from-scratch and PINNED TO PUBLISHED VECTORS in tests (not
self-consistency): AES-128/256 against the FIPS-197 appendix
plaintext/ciphertext examples, with the S-box COMPUTED (GF(2^8) inverse +
affine transform) rather than transcribed.  RC4 is the classic KSA/PRGA.
MD5/SHA-256/384/512 come from ``hashlib``.

Strings: this handler decrypts STREAMS (what rasterization reads).
Top-level strings in encrypted documents (docinfo etc.) are not
decrypted — a documented limitation; no pdfx consumer reads them.
"""

from __future__ import annotations

import hashlib
import struct

# --- RC4 -------------------------------------------------------------

def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


# --- AES (FIPS-197) ---------------------------------------------------
#
# The S-box is COMPUTED: multiplicative inverse in GF(2^8) mod the AES
# polynomial x^8+x^4+x^3+x+1, then the affine transform
# b ^ rot1(b) ^ rot2(b) ^ rot3(b) ^ rot4(b) ^ 0x63 — no transcribed table
# to get wrong.  Tests pin full encrypt/decrypt against the FIPS-197
# appendix C vectors.

def _gf_mul(a: int, b: int) -> int:
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_sbox() -> tuple[bytes, bytes]:
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = bytearray(256)
    for x in range(256):
        b = inv[x]
        s = 0x63
        for shift in range(5):  # b ^ rot1 ^ rot2 ^ rot3 ^ rot4
            s ^= ((b << shift) | (b >> (8 - shift))) & 0xFF
        sbox[x] = s
    invbox = bytearray(256)
    for x in range(256):
        invbox[sbox[x]] = x
    return bytes(sbox), bytes(invbox)


_SBOX, _INV_SBOX = _build_sbox()
# MixColumns / InvMixColumns multiplication tables
_MUL = {
    n: bytes(_gf_mul(n, x) for x in range(256))
    for n in (2, 3, 9, 11, 13, 14)
}

# T-tables: SubBytes + MixColumns folded into four 32-bit lookups per
# output column — the classic software-AES shape.  Column word layout:
# b_row0<<24 | b_row1<<16 | b_row2<<8 | b_row3.
_TE: list[list[int]] = []
for _rot in range(4):
    _t = []
    for _x in range(256):
        _s = _SBOX[_x]
        _w = (
            (_gf_mul(_s, 2) << 24)
            | (_s << 16)
            | (_s << 8)
            | _gf_mul(_s, 3)
        )
        _t.append(((_w >> (8 * _rot)) | (_w << (32 - 8 * _rot))) & 0xFFFFFFFF)
    _TE.append(_t)


class AES:
    """AES-128/192/256 block cipher (encrypt + decrypt, 16-byte blocks)."""

    def __init__(self, key: bytes):
        if len(key) not in (16, 24, 32):
            raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
        nk = len(key) // 4
        self.nr = nk + 6
        words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
        rcon = 1
        for i in range(nk, 4 * (self.nr + 1)):
            t = list(words[i - 1])
            if i % nk == 0:
                t = t[1:] + t[:1]  # RotWord
                t = [_SBOX[b] for b in t]  # SubWord
                t[0] ^= rcon
                rcon = _gf_mul(rcon, 2)
            elif nk > 6 and i % nk == 4:
                t = [_SBOX[b] for b in t]
            words.append([a ^ b for a, b in zip(words[i - nk], t)])
        self._rk = [
            bytes(b for w in words[4 * r : 4 * r + 4] for b in w)
            for r in range(self.nr + 1)
        ]
        # round keys as big-endian column words for the T-table path
        self._rkw = [
            [int.from_bytes(k[4 * c : 4 * c + 4], "big") for c in range(4)]
            for k in self._rk
        ]

    @staticmethod
    def _add(state: bytearray, rk: bytes) -> None:
        for i in range(16):
            state[i] ^= rk[i]

    def encrypt_block(self, block: bytes) -> bytes:
        # T-table path: four 32-bit lookups + XORs per output column
        # (SubBytes/ShiftRows/MixColumns folded); final round is plain
        # SubBytes + ShiftRows.  ~6x the bytearray round loop — this is
        # the hash_2b hot path for AES-256 documents.
        t0, t1, t2, t3 = _TE
        sbox = _SBOX
        rkw = self._rkw
        w = [
            int.from_bytes(block[c : c + 4], "big") ^ rkw[0][c >> 2]
            for c in range(0, 16, 4)
        ]
        for rnd in range(1, self.nr):
            rk = rkw[rnd]
            w = [
                t0[(w[c] >> 24) & 255]
                ^ t1[(w[(c + 1) & 3] >> 16) & 255]
                ^ t2[(w[(c + 2) & 3] >> 8) & 255]
                ^ t3[w[(c + 3) & 3] & 255]
                ^ rk[c]
                for c in range(4)
            ]
        rk = rkw[self.nr]
        out = bytearray(16)
        for c in range(4):
            v = (
                (sbox[(w[c] >> 24) & 255] << 24)
                | (sbox[(w[(c + 1) & 3] >> 16) & 255] << 16)
                | (sbox[(w[(c + 2) & 3] >> 8) & 255] << 8)
                | sbox[w[(c + 3) & 3] & 255]
            ) ^ rk[c]
            out[4 * c : 4 * c + 4] = v.to_bytes(4, "big")
        return bytes(out)

    def decrypt_block(self, block: bytes) -> bytes:
        s = bytearray(block)
        self._add(s, self._rk[self.nr])
        for rnd in range(self.nr - 1, -1, -1):
            # InvShiftRows: row r rotates right r
            s = bytearray(
                s[(i - 4 * (i % 4)) % 16] for i in range(16)
            )
            s = bytearray(_INV_SBOX[b] for b in s)  # InvSubBytes
            self._add(s, self._rk[rnd])
            if rnd != 0:  # InvMixColumns
                m9, m11, m13, m14 = _MUL[9], _MUL[11], _MUL[13], _MUL[14]
                t = bytearray(16)
                for c in range(0, 16, 4):
                    a0, a1, a2, a3 = s[c : c + 4]
                    t[c] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
                    t[c + 1] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
                    t[c + 2] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
                    t[c + 3] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
                s = t
        return bytes(s)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC input must be a multiple of 16 bytes")
    aes = AES(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = aes.encrypt_block(block)
        out += prev
    return bytes(out)


_INV_SHIFT_IDX = None
_NP_TABLES = None


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Vectorized CBC decrypt: unlike encryption, CBC decryption has no
    chain dependency (Pᵢ = D(Cᵢ) ⊕ Cᵢ₋₁), so the block cipher runs over
    ALL blocks at once as NumPy table lookups/XORs — ~100× the per-block
    Python loop on page-sized streams.  Pinned against the scalar
    ``decrypt_block`` in tests."""
    global _INV_SHIFT_IDX, _NP_TABLES
    import numpy as np

    if len(data) % 16:
        raise ValueError(f"CBC ciphertext length {len(data)} not a block multiple")
    if not data:
        return b""
    if _INV_SHIFT_IDX is None:
        _INV_SHIFT_IDX = np.array(
            [(i - 4 * (i % 4)) % 16 for i in range(16)], dtype=np.intp
        )
        _NP_TABLES = (
            np.frombuffer(_INV_SBOX, dtype=np.uint8),
            tuple(np.frombuffer(_MUL[m], dtype=np.uint8) for m in (9, 11, 13, 14)),
        )
    inv_sbox, (m9, m11, m13, m14) = _NP_TABLES
    aes = AES(key)
    ct = np.frombuffer(data, dtype=np.uint8).reshape(-1, 16)
    rk = [np.frombuffer(k, dtype=np.uint8) for k in aes._rk]
    s = ct ^ rk[aes.nr]
    for rnd in range(aes.nr - 1, -1, -1):
        s = s[:, _INV_SHIFT_IDX]  # InvShiftRows
        s = inv_sbox[s]  # InvSubBytes
        s = s ^ rk[rnd]
        if rnd:  # InvMixColumns: byte i = column i//4, row i%4
            a0, a1, a2, a3 = s[:, 0::4], s[:, 1::4], s[:, 2::4], s[:, 3::4]
            t = np.empty_like(s)
            t[:, 0::4] = m14[a0] ^ m11[a1] ^ m13[a2] ^ m9[a3]
            t[:, 1::4] = m9[a0] ^ m14[a1] ^ m11[a2] ^ m13[a3]
            t[:, 2::4] = m13[a0] ^ m9[a1] ^ m14[a2] ^ m11[a3]
            t[:, 3::4] = m11[a0] ^ m13[a1] ^ m9[a2] ^ m14[a3]
            s = t
    prev = np.vstack([np.frombuffer(iv, dtype=np.uint8)[None, :], ct[:-1]])
    return (s ^ prev).tobytes()


# --- standard security handler (ISO 32000-1 §7.6.3) -------------------

PAD = bytes(
    (
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    )
)


def _padded(pwd: bytes) -> bytes:
    return (pwd + PAD)[:32]


def _file_key_r234(
    pwd: bytes, o: bytes, p: int, id0: bytes, r: int, n: int,
    encrypt_metadata: bool,
) -> bytes:
    """Algorithm 2: the RC4/AES-128 file encryption key."""
    h = hashlib.md5()
    h.update(_padded(pwd))
    h.update(o[:32])
    # P is a SIGNED 32-bit value but hostile files carry anything:
    # hash its low 32 bits (identical for all legal values) instead of
    # letting struct.error escape as a non-ValueError
    h.update(struct.pack("<I", p & 0xFFFFFFFF))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:n]).digest()
    return key[:n]


def compute_o(owner_pwd: bytes, user_pwd: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry."""
    key = hashlib.md5(_padded(owner_pwd)).digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:n]
    o = rc4(key, _padded(user_pwd))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def compute_u(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4/5: the /U entry for a given file key."""
    if r == 2:
        return rc4(file_key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(file_key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in file_key), u)
    return u + b"\x00" * 16


import functools


@functools.lru_cache(maxsize=64)
def hash_2b(pwd: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the revision-6 iterated SHA-2 hash.
    Cached: the same /Encrypt salts repeat across every page/parse of a
    document (and across a corpus encrypted in one batch), and the 64+
    serial AES-CBC rounds are the expensive part of opening an AES-256
    document."""
    k = hashlib.sha256(pwd + salt + udata).digest()
    i = 0
    while True:
        k1 = (pwd + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = {
            0: hashlib.sha256, 1: hashlib.sha384, 2: hashlib.sha512
        }[sum(e[:16]) % 3](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def authenticate_empty_user(enc: dict, id0: bytes):
    """Empty-user-password authentication → (file_key, cfm) where cfm is
    'RC4' | 'AESV2' | 'AESV3'.  Raises ValueError on unsupported handlers
    or when a real user password is required."""
    filt = str(enc.get("Filter", ""))
    if filt != "Standard":
        raise ValueError(f"unsupported PDF security handler /{filt}")
    v = int(enc.get("V", 0))
    r = int(enc.get("R", 0))
    o = bytes(enc.get("O", b""))
    u = bytes(enc.get("U", b""))
    p = int(enc.get("P", -1))
    if v == 5:
        if r not in (5, 6):
            raise ValueError(f"unsupported /V 5 revision {r}")
        vsalt, ksalt = u[32:40], u[40:48]
        if r == 6:
            if hash_2b(b"", vsalt) != u[:32]:
                raise ValueError(
                    "password-protected PDF (user password required)"
                )
            ik = hash_2b(b"", ksalt)
        else:  # r == 5 (deprecated Adobe extension)
            if hashlib.sha256(b"" + vsalt).digest() != u[:32]:
                raise ValueError(
                    "password-protected PDF (user password required)"
                )
            ik = hashlib.sha256(b"" + ksalt).digest()
        ue = bytes(enc.get("UE", b""))
        if len(ue) != 32:
            raise ValueError("PDF /V 5 encryption missing /UE")
        file_key = aes_cbc_decrypt(ik, b"\x00" * 16, ue)
        return file_key, "AESV3"
    if v in (1, 2, 4):
        if r not in (2, 3, 4):
            raise ValueError(f"unsupported standard-handler revision {r}")
        n = max(5, min(16, int(enc.get("Length", 40)) // 8))
        if v == 1:
            n = 5
        em = bool(enc.get("EncryptMetadata", True))
        cfm = "RC4"
        if v == 4:
            cf = enc.get("CF", {})
            stmf = str(enc.get("StmF", "Identity"))
            cfd = cf.get(stmf, {}) if stmf != "Identity" else {}
            cfm = str(cfd.get("CFM", "Identity"))
            if cfm == "V2":
                cfm = "RC4"
            if stmf == "Identity":
                # streams are NOT encrypted (only strings are) — a real
                # /V 4 configuration; the stream decryptor is a no-op
                cfm = "Identity"
            elif cfm not in ("RC4", "AESV2"):
                raise ValueError(f"unsupported PDF crypt filter /{cfm}")
        key = _file_key_r234(b"", o, p, id0, r, n, em)
        want_u = compute_u(key, id0, r)
        ok = (u[:32] == want_u[:32]) if r == 2 else (u[:16] == want_u[:16])
        if not ok:
            raise ValueError("password-protected PDF (user password required)")
        return key, cfm
    raise ValueError(f"unsupported PDF encryption /V {v}")


def object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    """Algorithm 1: the per-object RC4/AES-128 key (not used for /V 5)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]


def _unpad(data: bytes) -> bytes:
    if not data:
        return data
    k = data[-1]
    if not 1 <= k <= 16 or k > len(data):
        raise ValueError(f"bad AES padding byte {k}")
    return data[:-k]


def make_decryptor(enc: dict, id0: bytes):
    """→ callable(num, gen, stream_bytes) -> plaintext bytes."""
    file_key, cfm = authenticate_empty_user(enc, id0)

    def decrypt(num: int, gen: int, data: bytes) -> bytes:
        if cfm == "Identity":
            return data  # /StmF /Identity: streams stored in the clear
        if cfm == "AESV3":
            if len(data) < 16:
                raise ValueError("AES stream shorter than its IV")
            return _unpad(aes_cbc_decrypt(file_key, data[:16], data[16:]))
        key = object_key(file_key, num, gen, cfm == "AESV2")
        if cfm == "AESV2":
            if len(data) < 16:
                raise ValueError("AES stream shorter than its IV")
            return _unpad(aes_cbc_decrypt(key, data[:16], data[16:]))
        return rc4(key, data)

    return decrypt


def make_encryptor(method: str, p: int = -3904, id0: bytes = b"\x01" * 16):
    """Fixture side: → (encrypt_dict_entries, callable(num, gen, data)).

    ``method``: 'rc4-40' | 'rc4-128' | 'aes-128' | 'aes-256'.  The user
    password is empty (the permissions-only shape scan archives ship);
    the owner password is fixed.  IVs derive deterministically from the
    object number so fixtures are byte-reproducible."""
    owner = b"fixture-owner"
    if method == "aes-256":
        vsalt, ksalt = b"VSALTvsa", b"KSALTksa"
        file_key = hashlib.sha256(b"fixture aes-256 file key").digest()
        ik = hash_2b(b"", ksalt)
        ue = aes_cbc_encrypt(ik, b"\x00" * 16, file_key)
        u = hash_2b(b"", vsalt) + vsalt + ksalt
        # owner entries: hashed over the owner password + the full U
        ovs, oks = b"OVSALTov", b"OKSALTok"
        o = hash_2b(owner, ovs, u) + ovs + oks
        oe = aes_cbc_encrypt(hash_2b(owner, oks, u), b"\x00" * 16, file_key)
        enc = {
            "Filter": "Standard", "V": 5, "R": 6, "Length": 256, "P": p,
            "O": o, "U": u, "OE": oe, "UE": ue,
            "Perms": b"\x00" * 16,  # not verified by this reader
            "CF": {"StdCF": {"CFM": "AESV3", "Length": 32}},
            "StmF": "StdCF", "StrF": "StdCF",
        }

        def encrypt(num, gen, data):
            iv = hashlib.md5(b"iv%d-%d" % (num, gen)).digest()
            k = 16 - len(data) % 16
            return iv + aes_cbc_encrypt(file_key, iv, data + bytes([k]) * k)

        return enc, encrypt
    r, v, bits = {
        "rc4-40": (2, 1, 40),
        "rc4-128": (3, 2, 128),
        "aes-128": (4, 4, 128),
    }[method]
    n = bits // 8
    o = compute_o(owner, b"", r, n)
    file_key = _file_key_r234(b"", o, p, id0, r, n, True)
    u = compute_u(file_key, id0, r)
    enc = {"Filter": "Standard", "V": v, "R": r, "Length": bits, "P": p,
           "O": o, "U": u}
    if v == 4:
        enc["CF"] = {"StdCF": {"CFM": "AESV2", "Length": 16}}
        enc["StmF"] = "StdCF"
        enc["StrF"] = "StdCF"

    def encrypt(num, gen, data):
        key = object_key(file_key, num, gen, method == "aes-128")
        if method == "aes-128":
            iv = hashlib.md5(b"iv%d-%d" % (num, gen)).digest()
            k = 16 - len(data) % 16
            return iv + aes_cbc_encrypt(key, iv, data + bytes([k]) * k)
        return rc4(key, data)

    return enc, encrypt

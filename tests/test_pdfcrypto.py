"""PDF standard-security-handler tests.

The crypto primitives are pinned to PUBLISHED vectors (FIPS-197 appendix
C for AES-128/192/256, the classic RC4 'Key'/'Plaintext' vector) — not
self-consistency — and the handler is gated end-to-end: every encryption
method rasterizes pixel-identically to its plaintext source, a wrong
user password refuses with a named error, and q55's golden gate rotates
encrypted scanned pages.
"""

import numpy as np
import pytest

from tableextraction_spark.pdfcrypto import (
    AES,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    authenticate_empty_user,
    hash_2b,
    make_encryptor,
    rc4,
)
from tableextraction_spark.pdfx import (
    build_page_pdf,
    build_scanned_page_pdf,
    encrypt_pdf,
    parse_pdf,
    rasterize_pdf_page,
)

_PT = bytes.fromhex("00112233445566778899aabbccddeeff")


@pytest.mark.parametrize(
    "key_hex,ct_hex",
    [
        # FIPS-197 Appendix C.1 / C.2 / C.3
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f"
         "101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ],
)
def test_aes_fips197_vectors(key_hex, ct_hex):
    aes = AES(bytes.fromhex(key_hex))
    ct = aes.encrypt_block(_PT)
    assert ct.hex() == ct_hex
    assert aes.decrypt_block(ct) == _PT


def test_rc4_published_vector():
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    # involution: RC4 is its own inverse
    assert rc4(b"k1", rc4(b"k1", b"some stream data")) == b"some stream data"


def test_cbc_roundtrip_and_block_check():
    key = bytes(range(32))
    iv = bytes(range(16, 32))
    data = bytes(range(256)) * 2
    assert aes_cbc_decrypt(key, iv, aes_cbc_encrypt(key, iv, data)) == data
    with pytest.raises(ValueError, match="block"):
        aes_cbc_decrypt(key, iv, b"short!")


def test_hash_2b_terminates_and_is_deterministic():
    a = hash_2b(b"", b"saltsalt")
    assert len(a) == 32
    assert a == hash_2b(b"", b"saltsalt")
    assert a != hash_2b(b"x", b"saltsalt")


@pytest.mark.parametrize("method", ["rc4-40", "rc4-128", "aes-128", "aes-256"])
def test_encrypted_pdf_rasterizes_pixel_exact(method):
    base = build_page_pdf([(20, 20, 120, 80)], [(30, 30, "HELLO 42")], 200, 150)
    ref = rasterize_pdf_page(base)
    enc = encrypt_pdf(base, method)
    assert enc[:5] == b"%PDF-"
    assert b"Encrypt" in enc
    assert np.array_equal(rasterize_pdf_page(enc), ref)


@pytest.mark.parametrize("codec", ["ccitt", "jbig2", "jbig2sym"])
def test_encrypted_scanned_pdf_pixel_exact(codec):
    """The archive-codec lanes (CCITT/JBIG2 incl. the /JBIG2Globals
    shared-dictionary stream) survive encryption — every referenced
    stream decrypts with its own object key."""
    img = (np.random.default_rng(3).random((64, 96)) > 0.7).astype(
        np.uint8
    ) * 255
    pdf = build_scanned_page_pdf(img, codec=codec)
    ref = rasterize_pdf_page(pdf)
    assert np.array_equal(rasterize_pdf_page(encrypt_pdf(pdf, "aes-128")), ref)
    assert np.array_equal(rasterize_pdf_page(encrypt_pdf(pdf, "aes-256")), ref)


def test_wrong_user_password_named_refusal():
    base = build_page_pdf([(10, 10, 60, 40)], [], 100, 80)
    enc = bytearray(encrypt_pdf(base, "rc4-128"))
    # corrupt the /U entry: authentication must fail loudly, not decode
    # garbage pixels
    i = enc.find(b"/U (")
    assert i > 0
    enc[i + 4] ^= 0x5A
    with pytest.raises(ValueError, match="password"):
        parse_pdf(bytes(enc))


def test_aes256_wrong_password_named_refusal():
    base = build_page_pdf([(10, 10, 60, 40)], [], 100, 80)
    enc = bytearray(encrypt_pdf(base, "aes-256"))
    i = enc.find(b"/U (")
    assert i > 0
    enc[i + 4] ^= 0x5A
    with pytest.raises(ValueError, match="password"):
        parse_pdf(bytes(enc))


def test_unsupported_handler_named():
    with pytest.raises(ValueError, match="security handler"):
        authenticate_empty_user({"Filter": "MyCustomDRM", "V": 4}, b"")
    with pytest.raises(ValueError, match="/V 9"):
        authenticate_empty_user({"Filter": "Standard", "V": 9}, b"")


def test_double_encrypt_refused():
    base = build_page_pdf([(10, 10, 60, 40)], [], 100, 80)
    enc = encrypt_pdf(base, "aes-128")
    with pytest.raises(ValueError, match="already encrypted"):
        encrypt_pdf(enc, "aes-128")


def test_encrypted_pdf_through_decode_page():
    """The media routing lane: an encrypted scanned PDF decodes through
    decode_page like any other payload."""
    from tableextraction_spark.media import decode_page

    img = (np.random.default_rng(5).random((40, 60)) > 0.6).astype(
        np.uint8
    ) * 255
    pdf = build_scanned_page_pdf(img, codec="ccitt")
    out = decode_page(encrypt_pdf(pdf, "aes-128"))
    assert np.array_equal(out, decode_page(pdf))


def test_make_encryptor_decryptor_all_methods_roundtrip():
    from tableextraction_spark.pdfcrypto import make_decryptor

    for method in ("rc4-40", "rc4-128", "aes-128", "aes-256"):
        enc_d, encf = make_encryptor(method, id0=b"\x07" * 16)
        dec = make_decryptor(enc_d, b"\x07" * 16)
        for num, gen in ((1, 0), (5, 0), (300, 1)):
            data = bytes((num * 37 + i) & 0xFF for i in range(77))
            assert dec(num, gen, encf(num, gen, data)) == data, (method, num)


def test_stmf_identity_streams_pass_through():
    """/V 4 with /StmF /Identity: streams are stored in the clear (only
    strings are encrypted) — the stream decryptor must be a no-op, not a
    refusal."""
    from tableextraction_spark.pdfcrypto import compute_o, compute_u
    from tableextraction_spark.pdfcrypto import _file_key_r234, make_decryptor

    o = compute_o(b"owner", b"", 4, 16)
    key = _file_key_r234(b"", o, -3904, b"\x01" * 16, 4, 16, True)
    enc = {
        "Filter": "Standard", "V": 4, "R": 4, "Length": 128, "P": -3904,
        "O": o, "U": compute_u(key, b"\x01" * 16, 4),
        "CF": {"StdCF": {"CFM": "AESV2", "Length": 16}},
        "StmF": "Identity", "StrF": "StdCF",
    }
    dec = make_decryptor(enc, b"\x01" * 16)
    assert dec(7, 0, b"clear stream bytes") == b"clear stream bytes"


def test_hostile_p_value_is_valueerror_not_structerror():
    from tableextraction_spark.pdfcrypto import authenticate_empty_user

    enc = {"Filter": "Standard", "V": 2, "R": 3, "Length": 128,
           "P": 2**40, "O": b"\x00" * 32, "U": b"\x00" * 32}
    with pytest.raises(ValueError):  # auth fails, never struct.error
        authenticate_empty_user(enc, b"\x00" * 16)

"""Standard-security-handler decryption tests (ISO 32000 §7.6.3):
mini PDFs encrypted test-side with RC4 per Algorithms 2/3 (empty owner
and user passwords) must extract their text layer; unsupported
encryption must yield empty text, never garbage."""

from __future__ import annotations

import hashlib
import zlib

from ndl_core_data_pipeline_spark.functions import pdf as P
from ndl_core_data_pipeline_spark.functions import udfs

ID0 = bytes.fromhex("0123456789abcdef0123456789abcdef")
PERMS = -3904  # typical print/copy-restricted permission bits


def _owner_entry(r: int, n_key: int) -> bytes:
    # Algorithm 3 with empty owner+user passwords
    h = hashlib.md5(P._PW_PAD).digest()
    if r == 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    rc4key = h[:n_key]
    o = P._rc4(rc4key, P._PW_PAD)
    if r == 3:
        for i in range(1, 20):
            o = P._rc4(bytes(b ^ i for b in rc4key), o)
    return o


def _file_key(o_entry: bytes, r: int, n_key: int) -> bytes:
    p_bytes = (PERMS & 0xFFFFFFFF).to_bytes(4, "little")
    h = hashlib.md5(P._PW_PAD + o_entry + p_bytes + ID0).digest()
    if r == 3:
        for _ in range(50):
            h = hashlib.md5(h[:n_key]).digest()
    return h[:n_key]


def _obj_key(key: bytes, num: int, gen: int) -> bytes:
    return hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()[: min(len(key) + 5, 16)]


def _user_entry(key: bytes, r: int) -> bytes:
    # Algorithm 4 (rev 2) / Algorithm 5 (rev >= 3)
    if r == 2:
        return P._rc4(key, P._PW_PAD)
    x = hashlib.md5(P._PW_PAD + ID0).digest()
    x = P._rc4(key, x)
    for i in range(1, 20):
        x = P._rc4(bytes(b ^ i for b in key), x)
    return x + b"\x00" * 16


def _encrypted_pdf(content: bytes, r: int) -> bytes:
    v, n_key, length_bits = (1, 5, 40) if r == 2 else (2, 16, 128)
    o_entry = _owner_entry(r, n_key)
    key = _file_key(o_entry, r, n_key)
    u_entry = _user_entry(key, r)
    comp = P._rc4(_obj_key(key, 4, 0), zlib.compress(content))
    enc_dict = (
        b"<</Filter/Standard/V %d/R %d/Length %d/P %d/O <%s>/U <%s>>>"
        % (v, r, length_bits, PERMS, o_entry.hex().encode(), u_entry.hex().encode())
    )
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
        enc_dict,
    ]
    out = bytearray(b"%PDF-1.4\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += (
        b"trailer\n<</Size 7/Root 1 0 R/Encrypt 6 0 R/ID[<%s><%s>]>>\n%%%%EOF"
        % (ID0.hex().encode(), ID0.hex().encode())
    )
    return bytes(out)


CONTENT = b"BT /F1 12 Tf 72 720 Td (Restricted document text) Tj ET"


def test_rc4_40bit_rev2_decrypts():
    text = udfs.extract_pdf_text(_encrypted_pdf(CONTENT, r=2), ocr_threshold=0)
    assert "Restricted document text" in text


def test_rc4_128bit_rev3_decrypts():
    text = udfs.extract_pdf_text(_encrypted_pdf(CONTENT, r=3), ocr_threshold=0)
    assert "Restricted document text" in text


def test_unsupported_aes_yields_empty_not_garbage():
    pdf = _encrypted_pdf(CONTENT, r=3).replace(b"/V 2/R 3", b"/V 5/R 6")
    assert udfs.extract_pdf_text(pdf, ocr_threshold=0) == ""


def test_unencrypted_path_unchanged():
    # no /Encrypt: decryptor returns (None, supported) and extraction
    # behaves exactly as before
    decrypt, supported = P._encryption_decryptor(b"%PDF-1.4 no encryption")
    assert decrypt is None and supported


def test_rc4_vector():
    # public RC4 test vector (Key/Plaintext "Key"/"Plaintext")
    assert P._rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"


def test_v4_r4_rc4_crypt_filter_decrypts():
    # V4/R4 with /CFM/V2 (RC4 crypt filter) uses the R3 derivation; only
    # AESV2 should bail
    pdf = _encrypted_pdf(CONTENT, r=3)
    pdf = pdf.replace(
        b"<</Filter/Standard/V 2/R 3",
        b"<</Filter/Standard/V 4/R 4"
        b"/CF<</StdCF<</CFM/V2/Length 16>>>>/StmF/StdCF/StrF/StdCF",
    )
    text = udfs.extract_pdf_text(pdf, ocr_threshold=0)
    assert "Restricted document text" in text


def test_v4_r4_aes_yields_empty():
    pdf = _encrypted_pdf(CONTENT, r=3)
    pdf = pdf.replace(
        b"<</Filter/Standard/V 2/R 3",
        b"<</Filter/Standard/V 4/R 4"
        b"/CF<</StdCF<</CFM/AESV2/Length 16>>>>/StmF/StdCF/StrF/StdCF",
    )
    assert udfs.extract_pdf_text(pdf, ocr_threshold=0) == ""


def _aesv2_pdf(content: bytes) -> bytes:
    import zlib as _zlib

    from ndl_core_data_pipeline_spark.functions import aes

    n_key = 16
    o_entry = _owner_entry(3, n_key)
    key = _file_key(o_entry, 3, n_key)
    okey = hashlib.md5(
        key + (4).to_bytes(3, "little") + (0).to_bytes(2, "little") + b"sAlT"
    ).digest()[:16]
    comp = aes.cbc_encrypt(okey, b"\x01" * 16, _zlib.compress(content))
    enc_dict = (
        b"<</Filter/Standard/V 4/R 4/Length 128"
        b"/CF<</StdCF<</CFM/AESV2/Length 16>>>>/StmF/StdCF/StrF/StdCF"
        b"/P %d/O <%s>/U <%s>>>"
        % (PERMS, o_entry.hex().encode(), _user_entry(key, 4).hex().encode())
    )
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
        enc_dict,
    ]
    out = bytearray(b"%PDF-1.6\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += (
        b"trailer\n<</Size 7/Root 1 0 R/Encrypt 6 0 R/ID[<%s><%s>]>>\n%%%%EOF"
        % (ID0.hex().encode(), ID0.hex().encode())
    )
    return bytes(out)


def test_aesv2_decrypts():
    text = udfs.extract_pdf_text(_aesv2_pdf(CONTENT), ocr_threshold=0)
    assert "Restricted document text" in text


def _aesv3_pdf(content: bytes) -> bytes:
    import zlib as _zlib

    from ndl_core_data_pipeline_spark.functions import aes

    file_key = bytes(range(32))
    vsalt, ksalt = b"VVVVVVVV", b"KKKKKKKK"
    u_entry = P._r6_hash(b"", vsalt) + vsalt + ksalt
    ikey = P._r6_hash(b"", ksalt)
    ue_entry = aes.cbc_encrypt_nopad(ikey, bytes(16), file_key)
    comp = aes.cbc_encrypt(file_key, b"\x02" * 16, _zlib.compress(content))
    enc_dict = (
        b"<</Filter/Standard/V 5/R 6/Length 256"
        b"/CF<</StdCF<</CFM/AESV3/Length 32>>>>/StmF/StdCF/StrF/StdCF"
        b"/P %d/U <%s>/UE <%s>/O <%s>/OE <%s>>>"
        % (
            PERMS,
            u_entry.hex().encode(),
            ue_entry.hex().encode(),
            (b"\x00" * 48).hex().encode(),
            (b"\x00" * 32).hex().encode(),
        )
    )
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
        enc_dict,
    ]
    out = bytearray(b"%PDF-2.0\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<</Size 7/Root 1 0 R/Encrypt 6 0 R>>\n%%EOF"
    return bytes(out)


def test_aesv3_r6_decrypts():
    text = udfs.extract_pdf_text(_aesv3_pdf(CONTENT), ocr_threshold=0)
    assert "Restricted document text" in text


def test_aesv3_wrong_password_hash_yields_empty():
    pdf = _aesv3_pdf(CONTENT)
    # corrupt the U validation hash: empty-password check must fail closed
    u_start = pdf.find(b"/U <") + 4
    corrupted = pdf[:u_start] + b"00" * 4 + pdf[u_start + 8 :]
    assert udfs.extract_pdf_text(corrupted, ocr_threshold=0) == ""


def test_rc4_wrong_password_fails_closed():
    # corrupt /U: the empty-password validation must reject the file
    # (simulates a genuinely password-protected document)
    for r in (2, 3):
        pdf = _encrypted_pdf(CONTENT, r=r)
        u_start = pdf.find(b"/U <") + 4
        corrupted = pdf[:u_start] + b"ff" * 4 + pdf[u_start + 8 :]
        assert udfs.extract_pdf_text(corrupted, ocr_threshold=0) == ""


def test_stmf_identity_streams_stay_plaintext():
    # strings-only encryption: /StmF/Identity means streams are NOT
    # encrypted; the extractor must read them as-is
    n_key = 16
    o_entry = _owner_entry(3, n_key)
    key = _file_key(o_entry, 3, n_key)
    comp = zlib.compress(CONTENT)  # plaintext stream
    enc_dict = (
        b"<</Filter/Standard/V 4/R 4/Length 128"
        b"/CF<</StdCF<</CFM/V2/Length 16>>>>/StmF/Identity/StrF/StdCF"
        b"/P %d/O <%s>/U <%s>>>"
        % (PERMS, o_entry.hex().encode(), _user_entry(key, 4).hex().encode())
    )
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
        enc_dict,
    ]
    out = bytearray(b"%PDF-1.6\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += (
        b"trailer\n<</Size 7/Root 1 0 R/Encrypt 6 0 R/ID[<%s><%s>]>>\n%%%%EOF"
        % (ID0.hex().encode(), ID0.hex().encode())
    )
    text = udfs.extract_pdf_text(bytes(out), ocr_threshold=0)
    assert "Restricted document text" in text


def test_aesv3_r5_plain_sha256_decrypts():
    from ndl_core_data_pipeline_spark.functions import aes

    file_key = bytes(range(32, 64))
    vsalt, ksalt = b"11111111", b"22222222"
    u_entry = hashlib.sha256(b"" + vsalt).digest() + vsalt + ksalt
    ikey = hashlib.sha256(b"" + ksalt).digest()
    ue_entry = aes.cbc_encrypt_nopad(ikey, bytes(16), file_key)
    comp = aes.cbc_encrypt(file_key, b"\x03" * 16, zlib.compress(CONTENT))
    enc_dict = (
        b"<</Filter/Standard/V 5/R 5/Length 256"
        b"/P %d/U <%s>/UE <%s>>>"
        % (PERMS, u_entry.hex().encode(), ue_entry.hex().encode())
    )
    objects = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 4 0 R/MediaBox[0 0 612 792]>>",
        b"<</Length %d/Filter/FlateDecode>>\nstream\n" % len(comp)
        + comp
        + b"\nendstream",
        b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>",
        enc_dict,
    ]
    out = bytearray(b"%PDF-1.7\n")
    for i, o in enumerate(objects, 1):
        out += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    out += b"trailer\n<</Size 7/Root 1 0 R/Encrypt 6 0 R>>\n%%EOF"
    text = udfs.extract_pdf_text(bytes(out), ocr_threshold=0)
    assert "Restricted document text" in text


def test_direct_encrypt_dict_in_trailer():
    # /Encrypt as a direct inline dictionary (legal per ISO 32000) must
    # be detected, not treated as an unencrypted file
    pdf = _encrypted_pdf(CONTENT, r=3)
    # inline object 6's dict directly into the trailer
    enc_start = pdf.find(b"6 0 obj\n") + len(b"6 0 obj\n")
    enc_end = pdf.find(b"\nendobj", enc_start)
    enc_dict = pdf[enc_start:enc_end]
    pdf2 = pdf[:pdf.find(b"6 0 obj\n")] + pdf[enc_end + len(b"\nendobj\n"):]
    pdf2 = pdf2.replace(b"/Encrypt 6 0 R", b"/Encrypt" + enc_dict)
    text = udfs.extract_pdf_text(pdf2, ocr_threshold=0)
    assert "Restricted document text" in text


def test_literal_string_id_form_decrypts():
    # trailer /ID written as literal strings (...) instead of hex <...> —
    # equally legal per ISO 32000-1 §14.4 and must not fail closed
    pdf = _encrypted_pdf(CONTENT, r=3)
    hex_form = b"/ID[<%s><%s>]" % (ID0.hex().encode(), ID0.hex().encode())
    lit_form = b"/ID[(" + ID0 + b")(" + ID0 + b")]"
    assert hex_form in pdf
    text = udfs.extract_pdf_text(pdf.replace(hex_form, lit_form), ocr_threshold=0)
    assert "Restricted document text" in text

"""AES correctness against the FIPS-197 appendix C vectors + CBC
round-trips (the PDF AESV2/AESV3 stream layout: IV || ciphertext)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ndl_core_data_pipeline_spark.functions import aes

_PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_fips197_c1_aes128():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    ct = aes.encrypt_block(key, _PT)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes.decrypt_block(key, ct) == _PT


def test_fips197_c2_aes192():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    ct = aes.encrypt_block(key, _PT)
    assert ct.hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert aes.decrypt_block(key, ct) == _PT


def test_fips197_c3_aes256():
    key = bytes.fromhex(
        "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
    )
    ct = aes.encrypt_block(key, _PT)
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert aes.decrypt_block(key, ct) == _PT


@settings(max_examples=30, deadline=None)
@given(
    st.binary(min_size=16, max_size=16),
    st.binary(min_size=16, max_size=16),
    st.binary(max_size=200),
)
def test_cbc_roundtrip(key, iv, payload):
    assert aes.cbc_decrypt(key, aes.cbc_encrypt(key, iv, payload)) == payload


def test_cbc_rejects_malformed():
    key = bytes(16)
    assert aes.cbc_decrypt(key, b"short") is None
    assert aes.cbc_decrypt(key, bytes(33)) is None  # not block-aligned

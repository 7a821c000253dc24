"""Pure-Python AES (FIPS-197) — 128/192/256-bit keys, block cipher +
CBC mode. Written from the public specification for the PDF standard
security handler's AESV2/AESV3 crypt filters (ISO 32000 §7.6.2); the
FIPS-197 appendix vectors pin correctness in tests/test_aes.py.

Performance note: this is a per-document driver-of-UDF path (decrypt a
stream once, then parse); Python-speed AES is fine there — the hot
path of the engine never touches it.
"""

from __future__ import annotations

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8]


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        temp = list(words[i - 1])
        if i % nk == 0:
            temp = temp[1:] + temp[:1]
            temp = [_SBOX[b] for b in temp]
            temp[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            temp = [_SBOX[b] for b in temp]
        words.append([w ^ t for w, t in zip(words[i - nk], temp)])
    return [sum(words[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _add_round_key(state: list[int], rk: list[int]) -> None:
    for i in range(16):
        state[i] ^= rk[i]


def _sub_shift(state: list[int], box: list[int], inverse: bool) -> list[int]:
    s = [box[b] for b in state]
    out = [0] * 16
    for c in range(4):
        for r in range(4):
            src = 4 * c + r
            shift = -r if inverse else r
            out[4 * ((c) % 4) + r] = s[4 * ((c + shift) % 4) + r]
    return out


def _mix_columns(state: list[int], inverse: bool) -> list[int]:
    m = (14, 11, 13, 9) if inverse else (2, 3, 1, 1)
    out = [0] * 16
    for c in range(4):
        col = state[4 * c : 4 * c + 4]
        for r in range(4):
            out[4 * c + r] = (
                _mul(col[0], m[(0 - r) % 4])
                ^ _mul(col[1], m[(1 - r) % 4])
                ^ _mul(col[2], m[(2 - r) % 4])
                ^ _mul(col[3], m[(3 - r) % 4])
            )
    return out


def encrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _expand_key(key)
    state = list(block)
    _add_round_key(state, rks[0])
    for rnd in range(1, len(rks) - 1):
        state = _sub_shift(state, _SBOX, inverse=False)
        state = _mix_columns(state, inverse=False)
        _add_round_key(state, rks[rnd])
    state = _sub_shift(state, _SBOX, inverse=False)
    _add_round_key(state, rks[-1])
    return bytes(state)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    rks = _expand_key(key)
    state = list(block)
    _add_round_key(state, rks[-1])
    for rnd in range(len(rks) - 2, 0, -1):
        state = _sub_shift(state, _INV_SBOX, inverse=True)
        _add_round_key(state, rks[rnd])
        state = _mix_columns(state, inverse=True)
    state = _sub_shift(state, _INV_SBOX, inverse=True)
    _add_round_key(state, rks[0])
    return bytes(state)


def cbc_decrypt(key: bytes, data: bytes, strip_padding: bool = True) -> bytes | None:
    """data = IV || ciphertext (the PDF AESV2/AESV3 stream layout)."""
    if len(data) < 32 or len(data) % 16:
        return None
    iv, ct = data[:16], data[16:]
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        block = ct[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, block), prev))
        prev = block
    if strip_padding:
        pad = out[-1]
        if not 1 <= pad <= 16 or len(out) < pad:
            return None
        del out[-pad:]
    return bytes(out)


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC over already-block-aligned data, ciphertext only (no IV
    prefix) — the ISO 32032-2 Algorithm 2.B hardened-hash step."""
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = encrypt_block(key, block)
        out += prev
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(decrypt_block(key, block), prev))
        prev = block
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """IV || ciphertext with PKCS#7-style padding (test-side encryptor
    and the R6 key-derivation hash both need the forward direction)."""
    pad = 16 - (len(plaintext) % 16)
    data = plaintext + bytes([pad]) * pad
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = encrypt_block(key, block)
        out += prev
    return bytes(out)

"""AES core (``kernel/aes.py``): FIPS-197 known-answer vectors,
CBC round trips, padding behavior, and the block-parallel decrypt
against the scalar encrypt.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from credit_ocr_system_spark.kernel.aes import (  # noqa: E402
    _INV_SBOX,
    _SBOX,
    aes_decrypt_block,
    aes_encrypt_block,
    cbc_decrypt,
    cbc_encrypt,
)

KEY128 = bytes(range(16))
KEY256 = bytes(range(32))
PT = bytes.fromhex("00112233445566778899aabbccddeeff")


def test_fips197_appendix_c_vectors():
    # public known-answer vectors: the generated S-box, key schedule,
    # MixColumns tables, and round structure all have to be right at
    # once for these to come out
    assert aes_encrypt_block(KEY128, PT).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes_encrypt_block(KEY256, PT).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"


def test_sbox_is_a_generated_involution_pair():
    assert sorted(_SBOX.tolist()) == list(range(256))  # permutation
    assert int(_SBOX[0x53]) == 0xED  # spec example S(0x53) = 0xED
    assert np.array_equal(_INV_SBOX[_SBOX], np.arange(256))


def test_block_decrypt_inverts_encrypt():
    rng = np.random.default_rng(0)
    for key in (KEY128, KEY256):
        for _ in range(8):
            block = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
            assert aes_decrypt_block(key, aes_encrypt_block(
                key, block)) == block


def test_cbc_round_trip_and_padding():
    iv = bytes(range(100, 116))
    for key in (KEY128, KEY256):
        for n in (0, 1, 15, 16, 17, 1000):
            data = bytes((i * 7 + n) % 256 for i in range(n))
            enc = cbc_encrypt(key, data, iv)
            assert enc[:16] == iv
            assert len(enc) % 16 == 0
            assert len(enc) > len(data)  # PKCS#7 always pads
            assert cbc_decrypt(key, enc) == data


def test_cbc_no_padding_mode():
    iv = b"\x00" * 16
    data = bytes(range(32))
    enc = cbc_encrypt(KEY256, data, iv, add_padding=False)
    assert cbc_decrypt(KEY256, enc[16:], iv=iv,
                       strip_padding=False) == data
    with pytest.raises(ValueError, match="16-byte"):
        cbc_encrypt(KEY256, b"short", iv, add_padding=False)


def test_cbc_decrypt_is_block_parallel_consistent():
    # many blocks through the vectorized path == per-block scalar
    iv = bytes(range(16))
    data = bytes((i * 13 + 5) % 256 for i in range(160))
    enc = cbc_encrypt(KEY128, data, iv, add_padding=False)
    got = cbc_decrypt(KEY128, enc[16:], iv=iv, strip_padding=False)
    assert got == data
    # corrupt one ciphertext block: exactly that block and the next
    # are damaged (CBC property) — proves blocks decrypt independently
    bad = bytearray(enc)
    bad[16 + 32] ^= 0xFF          # ciphertext block 2
    out = cbc_decrypt(KEY128, bytes(bad[16:]), iv=iv,
                      strip_padding=False)
    assert out[:32] == data[:32]           # blocks 0-1 untouched
    assert out[32:48] != data[32:48]       # block 2 garbled
    assert out[48:64] != data[48:64]       # block 3 bit-flipped
    assert out[64:] == data[64:]           # blocks 4+ untouched

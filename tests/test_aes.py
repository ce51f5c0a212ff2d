"""AES validated against published FIPS-197 / NIST SP 800-38A vectors."""

import pytest

from spiderman_ray.functions.aescipher import (
    CipherAES,
    aes_decrypt_cbc,
    aes_decrypt_ecb,
    aes_encrypt_cbc,
    aes_encrypt_ecb,
)


def test_fips197_appendix_c_vectors():
    # FIPS-197 Appendix C.1 (AES-128), C.2 (AES-192), C.3 (AES-256)
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    cases = [
        ("000102030405060708090a0b0c0d0e0f", "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key_hex, ct_hex in cases:
        key = bytes.fromhex(key_hex)
        assert aes_encrypt_ecb(pt, key).hex() == ct_hex
        assert aes_decrypt_ecb(bytes.fromhex(ct_hex), key) == pt


def test_nist_cbc_vector():
    # NIST SP 800-38A F.2.1 CBC-AES128.Encrypt (first block)
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    assert aes_encrypt_cbc(pt, key, iv).hex() == "7649abac8119b246cee98e9b12e9197d"
    assert aes_decrypt_cbc(bytes.fromhex("7649abac8119b246cee98e9b12e9197d"), key, iv) == pt


@pytest.mark.parametrize("mode", ["MODE_ECB", "MODE_CBC"])
@pytest.mark.parametrize("pad", ["default", "PKCS5Padding"])
@pytest.mark.parametrize("code", ["base64", "hex"])
def test_cipher_wrapper_roundtrip(mode, pad, code):
    # the reference demo's usage shape (SP/utils/aes.py:77-88)
    c = CipherAES(key="123456781234567G", iv="ABCDEF1G34123412",
                  cipher_method=mode, pad_method=pad, code_method=code)
    msg = '["https://img0.cdn.example/im/1-0-0.jpg", "x"]'
    assert c.decrypt(c.encrypt(msg)) == msg


def test_wrapper_unicode():
    c = CipherAES(pad_method="PKCS5Padding", code_method="base64")
    assert c.decrypt(c.encrypt("中文 payload")) == "中文 payload"

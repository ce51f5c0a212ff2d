"""Pure-python AES (ECB/CBC) + the reference's cipher wrapper surface.

The reference wraps pycryptodome for site-specific encrypted payloads
(Cipher_AES, SP/utils/aes.py:15-74: ECB/CBC, 'default' space-padding or
PKCS5Padding, base64/hex transport encoding). No crypto library ships in
this container, so the block cipher itself is implemented here from the
public FIPS-197 specification and validated against its published test
vectors (tests/test_aes.py).

This is a data-pipeline utility for decoding crawled payloads — NOT a
hardened crypto implementation (no constant-time guarantees).
"""

from __future__ import annotations

import base64
import binascii

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B, 0xFE, 0xD7, 0xAB, 0x76,
    0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0, 0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0,
    0xB7, 0xFD, 0x93, 0x26, 0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2, 0xEB, 0x27, 0xB2, 0x75,
    0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0, 0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84,
    0x53, 0xD1, 0x00, 0xED, 0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F, 0x50, 0x3C, 0x9F, 0xA8,
    0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5, 0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2,
    0xCD, 0x0C, 0x13, 0xEC, 0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14, 0xDE, 0x5E, 0x0B, 0xDB,
    0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C, 0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79,
    0xE7, 0xC8, 0x37, 0x6D, 0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F, 0x4B, 0xBD, 0x8B, 0x8A,
    0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E, 0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E,
    0xE1, 0xF8, 0x98, 0x11, 0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F, 0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


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
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [sum(words[4 * r : 4 * r + 4], []) for r in range(nr + 1)]


def _encrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    nr = len(rk) - 1
    s = [[block[4 * c + r] for c in range(4)] for r in range(4)]  # column-major state
    s = [[s[r][c] ^ rk[0][4 * c + r] for c in range(4)] for r in range(4)]
    for rnd in range(1, nr + 1):
        s = [[_SBOX[s[r][c]] for c in range(4)] for r in range(4)]
        s = [s[r][r:] + s[r][:r] for r in range(4)]  # ShiftRows
        if rnd != nr:
            ns = [[0] * 4 for _ in range(4)]
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                ns[0][c] = _mul(a[0], 2) ^ _mul(a[1], 3) ^ a[2] ^ a[3]
                ns[1][c] = a[0] ^ _mul(a[1], 2) ^ _mul(a[2], 3) ^ a[3]
                ns[2][c] = a[0] ^ a[1] ^ _mul(a[2], 2) ^ _mul(a[3], 3)
                ns[3][c] = _mul(a[0], 3) ^ a[1] ^ a[2] ^ _mul(a[3], 2)
            s = ns
        s = [[s[r][c] ^ rk[rnd][4 * c + r] for c in range(4)] for r in range(4)]
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _decrypt_block(block: bytes, rk: list[list[int]]) -> bytes:
    nr = len(rk) - 1
    s = [[block[4 * c + r] for c in range(4)] for r in range(4)]
    s = [[s[r][c] ^ rk[nr][4 * c + r] for c in range(4)] for r in range(4)]
    for rnd in range(nr - 1, -1, -1):
        s = [s[r][-r:] + s[r][:-r] if r else s[r] for r in range(4)]  # InvShiftRows
        s = [[_INV_SBOX[s[r][c]] for c in range(4)] for r in range(4)]
        s = [[s[r][c] ^ rk[rnd][4 * c + r] for c in range(4)] for r in range(4)]
        if rnd != 0:
            ns = [[0] * 4 for _ in range(4)]
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                ns[0][c] = _mul(a[0], 14) ^ _mul(a[1], 11) ^ _mul(a[2], 13) ^ _mul(a[3], 9)
                ns[1][c] = _mul(a[0], 9) ^ _mul(a[1], 14) ^ _mul(a[2], 11) ^ _mul(a[3], 13)
                ns[2][c] = _mul(a[0], 13) ^ _mul(a[1], 9) ^ _mul(a[2], 14) ^ _mul(a[3], 11)
                ns[3][c] = _mul(a[0], 11) ^ _mul(a[1], 13) ^ _mul(a[2], 9) ^ _mul(a[3], 14)
            s = ns
    return bytes(s[r][c] for c in range(4) for r in range(4))


def aes_encrypt_ecb(data: bytes, key: bytes) -> bytes:
    rk = _expand_key(key)
    assert len(data) % 16 == 0
    return b"".join(_encrypt_block(data[i : i + 16], rk) for i in range(0, len(data), 16))


def aes_decrypt_ecb(data: bytes, key: bytes) -> bytes:
    rk = _expand_key(key)
    return b"".join(_decrypt_block(data[i : i + 16], rk) for i in range(0, len(data), 16))


def aes_encrypt_cbc(data: bytes, key: bytes, iv: bytes) -> bytes:
    rk = _expand_key(key)
    out, prev = [], iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, rk)
        out.append(prev)
    return b"".join(out)


def aes_decrypt_cbc(data: bytes, key: bytes, iv: bytes) -> bytes:
    rk = _expand_key(key)
    out, prev = [], iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out.append(bytes(a ^ b for a, b in zip(_decrypt_block(blk, rk), prev)))
        prev = blk
    return b"".join(out)


class CipherAES:
    """Reference-shaped wrapper (Cipher_AES, SP/utils/aes.py:15-74):
    modes MODE_ECB/MODE_CBC, pad 'default' (spaces) or 'PKCS5Padding',
    transport encoding base64/hex/None."""

    def __init__(self, key: str = "abcdefgh12345678", iv: str | None = None,
                 cipher_method: str = "MODE_ECB", pad_method: str = "default",
                 code_method: str | None = None):
        self.key = key.encode("utf-8")
        self.iv = (iv or "\x00" * 16).encode("utf-8")
        self.mode = cipher_method.upper()
        self.pad_method = pad_method
        self.code_method = code_method

    def _pad(self, data: bytes) -> bytes:
        n = 16 - len(data) % 16
        if self.pad_method == "PKCS5Padding":
            return data + bytes([n]) * n
        return data + b" " * (n % 16)  # reference 'default': space pad (none if aligned)

    def _unpad(self, data: bytes) -> bytes:
        if self.pad_method == "PKCS5Padding":
            return data[: -data[-1]]
        return data.rstrip()

    def encrypt(self, text: str) -> str:
        data = self._pad(text.encode("utf-8"))
        if self.mode == "MODE_CBC":
            ct = aes_encrypt_cbc(data, self.key, self.iv)
        else:
            ct = aes_encrypt_ecb(data, self.key)
        if self.code_method == "base64":
            return base64.encodebytes(ct).decode("utf-8").rstrip()
        if self.code_method == "hex":
            return binascii.b2a_hex(ct).decode("utf-8")
        return ct.hex()

    def decrypt(self, cipher_text: str) -> str:
        if self.code_method == "base64":
            ct = base64.decodebytes(cipher_text.encode("utf-8"))
        elif self.code_method == "hex":
            ct = binascii.a2b_hex(cipher_text)
        else:
            ct = bytes.fromhex(cipher_text)
        if self.mode == "MODE_CBC":
            pt = aes_decrypt_cbc(ct, self.key, self.iv)
        else:
            pt = aes_decrypt_ecb(ct, self.key)
        return self._unpad(pt).decode("utf-8")

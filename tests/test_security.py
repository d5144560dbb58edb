"""Security known-answer tests (3GPP 35.207/35.208/33.401 spec vectors —
the same sets as lib/test/common/test_eea*/eia*/f12345)."""

import pytest

from srslte_tpu.security import (EEA1, EEA2, EEA3, EIA1, EIA2, EIA3,
                                 cipher_decrypt, cipher_encrypt,
                                 integrity_mac, milenage_f1, milenage_f2345)
from srslte_tpu.security.aes import (aes128_cmac, aes128_ctr,
                                     aes128_encrypt_block)
from srslte_tpu.security.milenage import compute_opc, milenage_f5_star


def H(s):
    return bytes.fromhex(s)


def test_aes_fips197():
    key = H("000102030405060708090a0b0c0d0e0f")
    pt = H("00112233445566778899aabbccddeeff")
    assert aes128_encrypt_block(key, pt) == H(
        "69c4e0d86a7b0430d8cdb78070b4c55a")


def test_aes_cmac_rfc4493():
    k = H("2b7e151628aed2a6abf7158809cf4f3c")
    assert aes128_cmac(k, b"") == H("bb1d6929e95937287fa37d129b756746")
    assert aes128_cmac(k, H("6bc1bee22e409f96e93d7e117393172a")) == H(
        "070a16b46b4d4144f79bdd9dd04a287c")


# 33.401 test data (same across EEA1/EEA2 test set 1)
_KEY = H("d3c5d592327fb11c4035c6680af8c6d1")
_COUNT = 0x398A59B4
_BEARER = 0x15
_DIR = 1
_MSG = H("981ba6824c1bfb1ab4854720" "29b71d808ce33e2cc3c0b5fc1f3de8a6dc66b1f0")


def test_eea1_set1():
    ct = cipher_encrypt(EEA1, _KEY, _COUNT, _BEARER, _DIR, _MSG)
    exp = H("5d5bfe75eb04f68ce0a12377" "ea00b37d47c6a0ba063091550" "86a859c4341b378"[0:])
    exp = H("5d5bfe75eb04f68ce0a12377ea00b37d47c6a0ba06309155086a859c4341b378")
    # 253-bit message: compare all full bytes + the 5 valid bits of the last
    assert ct[:31] == exp[:31]
    assert (ct[31] ^ exp[31]) & 0xF8 == 0
    back = cipher_decrypt(EEA1, _KEY, _COUNT, _BEARER, _DIR, ct)
    assert back == _MSG


def test_eea2_set1():
    ct = cipher_encrypt(EEA2, _KEY, _COUNT, _BEARER, _DIR, _MSG)
    exp = H("e9fed8a63d155304d71df20bf3e82214b20ed7dad2f233dc3c22d7bdeeed8e78")
    assert ct[:31] == exp[:31]
    assert (ct[31] ^ exp[31]) & 0xF8 == 0
    assert cipher_decrypt(EEA2, _KEY, _COUNT, _BEARER, _DIR, ct) == _MSG


def test_eea3_set1():
    key = H("173d14ba5003731d7a60049470f00a29")
    msg = H("6cf653407355" "52ab0c9752fa6f9025fe0bd675d9005875b200000000")
    ct = cipher_encrypt(EEA3, key, 0x66035492, 0xF, 0, msg[:25])
    exp = H("a6c85fc66afb8533aafc2518dfe784940ee1e4b030238cc8")
    assert ct[:24] == exp  # 193 bits: 24 full bytes + 1 bit


def test_eia1_set1():
    key = H("2bd6459f82c5b300952c49104881ff48")
    msg = H("3332346263393861373479")  # 88 bits
    mac = integrity_mac(EIA1, key, 0x38A6F056, 0x1F, 0, msg)
    assert mac == H("731f1165")


def test_eia2_construction():
    """EIA2 = AES-CMAC(COUNT||BEARER||DIR||0^26 || MSG)[:4] (33.401 B.2.3);
    the CMAC core itself is RFC 4493 KAT-verified above."""
    key = H("2bd6459f82c5b300952c49104881ff48")
    msg = H("3332346263393861373479")
    count, bearer, direction = 0x38A6F056, 0x1F, 0
    mac = integrity_mac(EIA2, key, count, bearer, direction, msg)
    m = (count.to_bytes(4, "big")
         + bytes([(bearer << 3) | (direction << 2)]) + bytes(3) + msg)
    assert mac == aes128_cmac(key, m)[:4]
    # MAC must change with every input field
    assert mac != integrity_mac(EIA2, key, count + 1, bearer, direction, msg)
    assert mac != integrity_mac(EIA2, key, count, bearer, 1, msg)


def test_eia3_set1():
    mac = integrity_mac(EIA3, bytes(16), 0, 0, 0, bytes(4))
    # 35.223 test set 1: 1-bit message of 0
    from srslte_tpu.security.zuc import eia3

    mac1 = eia3(bytes(16), 0, 0, 0, bytes(4), length_bits=1)
    assert mac1 == H("c8a9595e")


def test_milenage_35207():
    k = H("465b5ce8b199b49faa5f0a2ee238a6bc")
    rand = H("23553cbe9637a89d218ae64dae47bf35")
    sqn = H("ff9bb4d0b607")
    amf = H("b9b9")
    op = H("cdc202d5123e20f62b6d676ac72cb318")
    opc = compute_opc(k, op)
    assert opc == H("cd63cb71954a9f4e48a5994e37a02baf")
    mac_a, mac_s = milenage_f1(k, opc, rand, sqn, amf)
    assert mac_a == H("4a9ffac354dfafb3")
    res, ck, ik, ak = milenage_f2345(k, opc, rand)
    assert res == H("a54211d5e3ba50bf")
    assert ck == H("b40ba9a3c58b2a05bbf0d987b21bf8cb")
    assert ik == H("f769bcd751044604127672711c6d3441")
    assert ak == H("aa689c648370")
    assert milenage_f5_star(k, opc, rand) == H("451e8beca43b")


def test_cipher_involution_all():
    data = bytes(range(64))
    for algo in (EEA1, EEA2, EEA3):
        ct = cipher_encrypt(algo, _KEY, 7, 3, 0, data)
        assert ct != data
        assert cipher_decrypt(algo, _KEY, 7, 3, 0, ct) == data

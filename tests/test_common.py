"""Tests for numerology, Gold sequences, CRC, Zadoff-Chu.

Oracles are independent straight-from-36.211 implementations (not the block
tricks used by the library code), mirroring the reference's self-checking test
style (lib/src/phy/*/test, SURVEY.md §4.1).
"""

import numpy as np
import pytest

from srslte_tpu.phy.common import params
from srslte_tpu.phy.common import sequence as seq
from srslte_tpu.phy.common import zc
from srslte_tpu.phy.fec import crc as crcmod


# ---------------------------------------------------------------- numerology
def test_symbol_sz_table():
    # phy_common.c:361-455
    assert [params.symbol_sz(p) for p in (6, 15, 25, 50, 75, 100)] == [
        128, 256, 512, 1024, 1536, 2048]
    assert params.sampling_freq_hz(100) == 30_720_000
    assert params.sampling_freq_hz(6) == 1_920_000


def test_cp_lengths():
    # SRSRAN_CP_LEN(symbol_sz, c) = ceil(c*N/2048); phy_common.h:125
    o = params.OfdmParams(6)
    assert o.cp_lens_slot() == (10, 9, 9, 9, 9, 9, 9)
    assert o.slot_len == 960 and o.sf_len == 1920
    o100 = params.OfdmParams(100)
    assert o100.cp_lens_slot() == (160, 144, 144, 144, 144, 144, 144)
    assert o100.sf_len == 30720
    ext = params.OfdmParams(6, params.CP.EXT)
    assert ext.cp_lens_slot() == (32,) * 6


# ------------------------------------------------------------ Gold sequence
def _gold_reference(seed: int, length: int) -> np.ndarray:
    """Direct 36.211 §7.2 recurrence, bit arrays (slow oracle)."""
    n = length + seq.NC
    x1 = np.zeros(n + 31, dtype=np.uint8)
    x2 = np.zeros(n + 31, dtype=np.uint8)
    x1[0] = 1
    for i in range(31):
        x2[i] = (seed >> i) & 1
    for i in range(n):
        x1[i + 31] = x1[i + 3] ^ x1[i]
        x2[i + 31] = x2[i + 3] ^ x2[i + 2] ^ x2[i + 1] ^ x2[i]
    return (x1[seq.NC : seq.NC + length] ^ x2[seq.NC : seq.NC + length]).astype(np.uint8)


@pytest.mark.parametrize("seed,length", [(0x12345, 100), (1, 64), (503, 1000), (0x7FFFFFFF, 257)])
def test_gold_sequence_vs_reference(seed, length):
    np.testing.assert_array_equal(seq.gold_sequence(seed, length), _gold_reference(seed, length))


def test_gold_sequence_signed():
    s = seq.gold_sequence(77, 50)
    f = seq.gold_sequence_signed(77, 50)
    np.testing.assert_array_equal(f, 1.0 - 2.0 * s.astype(np.float32))


def test_gold_sequence_jax_matches_host():
    import jax

    out = jax.jit(lambda s: seq.gold_sequence_jax(s, 200))(np.uint32(0xABCDE))
    np.testing.assert_array_equal(np.asarray(out), seq.gold_sequence(0xABCDE, 200))


# ----------------------------------------------------------------------- CRC
def _crc_reference(bits, poly, order):
    """Plain long-division oracle."""
    msg = list(bits) + [0] * order
    p = [(poly >> k) & 1 for k in range(order, -1, -1)]
    for i in range(len(bits)):
        if msg[i]:
            for j in range(order + 1):
                msg[i + j] ^= p[j]
    return np.array(msg[len(bits):], dtype=np.uint8)


@pytest.mark.parametrize("poly,order", [crcmod.LTE_CRC24A, crcmod.LTE_CRC24B,
                                        crcmod.LTE_CRC16, crcmod.LTE_CRC8])
def test_crc_vs_longdivision(poly, order):
    rng = np.random.default_rng(0)
    for n in (8, 40, 121):
        bits = rng.integers(0, 2, n).astype(np.uint8)
        np.testing.assert_array_equal(
            crcmod.crc_bits(bits, poly, order), _crc_reference(bits, poly, order))


def test_crc_matrix_matches_lfsr():
    rng = np.random.default_rng(1)
    poly, order = crcmod.LTE_CRC24A
    g = crcmod.crc_matrix(100, poly, order)
    bits = rng.integers(0, 2, (5, 100)).astype(np.uint8)
    via_mat = (bits @ g) % 2
    for b, m in zip(bits, via_mat):
        np.testing.assert_array_equal(crcmod.crc_bits(b, poly, order), m)


def test_crc_ok_device():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    poly, order = crcmod.LTE_CRC16
    bits = rng.integers(0, 2, (4, 60)).astype(np.uint8)
    tb = np.stack([crcmod.crc_attach(b, poly, order) for b in bits])
    ok = crcmod.crc_ok_device(jnp.asarray(tb), poly, order)
    assert np.all(np.asarray(ok))
    bad = tb.copy()
    bad[0, 3] ^= 1
    ok2 = np.asarray(crcmod.crc_ok_device(jnp.asarray(bad), poly, order))
    assert not ok2[0] and np.all(ok2[1:])


# ---------------------------------------------------------------- Zadoff-Chu
def test_pss_sequence_props():
    for nid2 in (0, 1, 2):
        s = zc.pss_sequence(nid2)
        assert s.shape == (62,)
        np.testing.assert_allclose(np.abs(s), 1.0, rtol=1e-6)
    # distinct roots -> low cross-correlation
    c = abs(np.vdot(zc.pss_sequence(0), zc.pss_sequence(1))) / 62
    assert c < 0.3


def test_zadoff_chu_autocorrelation():
    s = zc.zadoff_chu(25, 63)
    # ideal periodic autocorrelation: delta
    for lag in (1, 5, 20):
        r = abs(np.vdot(s, np.roll(s, lag))) / 63
        assert r < 1e-5


def test_tdd_frame_structure():
    """36.211 tables 4.2-1/4.2-2 lookups + DwPTS slot split."""
    from srslte_tpu.phy.common.params import CP
    from srslte_tpu.phy.common.tdd import SfType, TddConfig

    c1 = TddConfig(sf_config=1, ss_config=7)
    assert [c1.sf_type(i).value for i in range(10)] == list("DSUUDDSUUD")
    assert (c1.nof_dw, c1.nof_gp, c1.nof_up) == (10, 2, 2)
    assert c1.nof_dw_slot(0) == 7 and c1.nof_dw_slot(1) == 3
    assert c1.nof_harq == 4
    assert c1.ul_subframes() == (2, 3, 7, 8)
    assert 1 in c1.dl_subframes()  # DwPTS=10 >= 9 carries PDSCH

    c5 = TddConfig(sf_config=5, ss_config=0)
    assert c5.ul_subframes() == (2,)
    assert c5.nof_dw_slot(0, CP.NORM) == 3 and c5.nof_dw_slot(1) == 0
    assert 1 not in c5.dl_subframes()  # DwPTS=3: no PDSCH
    assert TddConfig(sf_config=0, ss_config=9).nof_up == 2

"""NR UCI coding (incl. PC-bit polar) and PUCCH formats 0/1/2.

Reference behavior: lib/src/phy/phch/uci_nr.c, pucch_nr.c,
ch_estimation/dmrs_pucch.c, fec/polar/polar_chanalloc.c (PC register).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.fec.polar import PolarCode, polar_decode_list, polar_encode
from srslte_tpu.phy.nr.params import NSYMB_SLOT, NrCarrier
from srslte_tpu.phy.nr.pucch_nr import NrPucch, NrPucchResource, occ_w
from srslte_tpu.phy.nr.uci_nr import ch_interleave_idx, uci_decode, uci_encode


# -- PC-bit polar -----------------------------------------------------------

@pytest.mark.parametrize("K,E", [(20, 240), (22, 150), (18, 120)])
def test_polar_pc_construction_and_roundtrip(K, E):
    code = PolarCode(K=K, E=E, n_max=10, with_pc=True)
    assert code.n_pc == 3
    assert len(code.pc_set) == 3 and len(code.k_set) == K
    # the wm-PC position rule (polar_code.c:278-283)
    if E > K + 189:
        assert (252 if K <= 21 else 248) in code.pc_set
    # PC matrix == the reference's 5-slot rotating register
    rng = np.random.default_rng(K)
    bits = rng.integers(0, 2, K).astype(np.uint8)
    y5, i_k = [0] * 5, 0
    reg_pc = {}
    kset = set(code.k_set.tolist())
    pcset = set(code.pc_set.tolist())
    for p in range(code.N):
        y5 = y5[1:] + [y5[0]]
        if p in kset:
            y5[0] ^= int(bits[i_k])
            i_k += 1
        elif p in pcset:
            reg_pc[p] = y5[0]
    pcm = (bits @ code.pc_matrix.T) % 2
    assert [reg_pc[p] for p in code.pc_set] == pcm.tolist()
    # noisy decode
    x = np.asarray(polar_encode(jnp.asarray(bits), code)).astype(np.float32)
    y = (1 - 2 * x) + 0.6 * rng.standard_normal(E)
    llr = jnp.asarray(-y * 5, jnp.float32)
    cands = np.asarray(polar_decode_list(llr, code, L=8))
    assert (cands[0] == bits).all()


def test_ch_interleaver_is_permutation():
    for e in (32, 108, 216, 500):
        idx = ch_interleave_idx(e)
        assert sorted(idx.tolist()) == list(range(e))


# -- UCI coding across all size regimes -------------------------------------

@pytest.mark.parametrize("a,e", [(1, 24), (2, 24), (5, 64), (11, 96),
                                 (14, 160), (22, 300), (40, 512),
                                 (400, 2200)])
def test_uci_roundtrip(a, e):
    rng = np.random.default_rng(a)
    bits = rng.integers(0, 2, a).astype(np.uint8)
    cw = uci_encode(bits, e).astype(np.float32)
    y = (1 - 2 * cw) + 0.4 * rng.standard_normal(len(cw))
    got, ok = uci_decode(jnp.asarray(-y * 8, jnp.float32), a)
    assert ok and np.array_equal(got, bits)


def test_uci_polar_crc_rejects_noise():
    rng = np.random.default_rng(9)
    llr = jnp.asarray(rng.standard_normal(300).astype(np.float32) * 10)
    got, ok = uci_decode(llr, 22)
    assert not ok


# -- PUCCH NR ---------------------------------------------------------------

def _chan(g, rng, h0=0.9 * np.exp(0.8j), n=0.03):
    x = np.asarray(g) * h0
    x = x + n * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
    return jnp.asarray(x.astype(np.complex64))


def test_occ_w_table_unit_modulus():
    for n in range(1, 8):
        for i in range(n):
            for m in range(n):
                assert abs(abs(occ_w(i, n, m)) - 1) < 1e-6


def test_pucch_format0_detects_shift():
    car = NrCarrier(n_prb=52, n_id=301)
    pu = NrPucch(car, slot=3)
    rng = np.random.default_rng(0)
    res = NrPucchResource(format=0, starting_prb=0, start_symbol=12,
                          nof_symbols=2, initial_cyclic_shift=3)
    for tx_mcs in (0, 6):
        g = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
        g = pu.format0_encode(g, res, m_cs=tx_mcs)
        mcs, corr = pu.format0_measure(_chan(g, rng), res, (0, 6))
        assert mcs == tx_mcs and corr > 0.7


@pytest.mark.parametrize("bits", [[0], [1], [0, 1], [1, 1]])
def test_pucch_format1_roundtrip(bits):
    car = NrCarrier(n_prb=52, n_id=301)
    pu = NrPucch(car, slot=5)
    rng = np.random.default_rng(1)
    res = NrPucchResource(format=1, starting_prb=51, start_symbol=4,
                          nof_symbols=10, initial_cyclic_shift=5,
                          time_domain_occ=2)
    g = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    g = pu.format1_encode(g, res, np.array(bits, np.uint8))
    got, metric = pu.format1_decode(_chan(g, rng), res, len(bits))
    assert got.tolist() == bits and metric > 0.5


@pytest.mark.parametrize("a,nprb,nsym", [(4, 1, 1), (11, 2, 1), (22, 4, 1),
                                         (16, 2, 2)])
def test_pucch_format2_roundtrip(a, nprb, nsym):
    car = NrCarrier(n_prb=52, n_id=77)
    pu = NrPucch(car, slot=2)
    rng = np.random.default_rng(a)
    res = NrPucchResource(format=2, starting_prb=10,
                          start_symbol=14 - nsym, nof_symbols=nsym,
                          nof_prb=nprb)
    uci = rng.integers(0, 2, a).astype(np.uint8)
    g = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    g = pu.format2_encode(g, res, uci, rnti=0x4601)
    got, ok = pu.format2_decode(_chan(g, rng), res, a, rnti=0x4601)
    assert ok and np.array_equal(got, uci)


def test_pucch_format2_multiuser_fdm():
    """Two UEs on disjoint PRBs in the same symbol decode independently."""
    car = NrCarrier(n_prb=52, n_id=77)
    pu = NrPucch(car, slot=2)
    rng = np.random.default_rng(3)
    r1 = NrPucchResource(format=2, starting_prb=0, start_symbol=13,
                         nof_symbols=1, nof_prb=2)
    r2 = NrPucchResource(format=2, starting_prb=2, start_symbol=13,
                         nof_symbols=1, nof_prb=2)
    u1 = rng.integers(0, 2, 10).astype(np.uint8)
    u2 = rng.integers(0, 2, 10).astype(np.uint8)
    g = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    g = pu.format2_encode(g, r1, u1, rnti=0x100)
    g = pu.format2_encode(g, r2, u2, rnti=0x200)
    rx = _chan(g, rng)
    got1, ok1 = pu.format2_decode(rx, r1, 10, rnti=0x100)
    got2, ok2 = pu.format2_decode(rx, r2, 10, rnti=0x200)
    assert ok1 and ok2
    assert np.array_equal(got1, u1) and np.array_equal(got2, u2)


@pytest.mark.parametrize("a,nprb,nsym,add", [(16, 1, 4, False),
                                             (40, 2, 10, False),
                                             (60, 3, 14, True)])
def test_pucch_format3_roundtrip(a, nprb, nsym, add):
    """Format 3: DFT-s-OFDM UCI with low-PAPR DMRS (pucch_nr.c format 3 +
    dmrs_pucch.c, 38.211 §6.3.2.5 / table 6.4.1.3.3.2-1)."""
    car = NrCarrier(n_prb=52, n_id=123)
    pu = NrPucch(car, slot=3)
    rng = np.random.default_rng(a)
    res = NrPucchResource(format=3, starting_prb=20, start_symbol=14 - nsym,
                          nof_symbols=nsym, nof_prb=nprb,
                          additional_dmrs=add)
    uci = rng.integers(0, 2, a).astype(np.uint8)
    g = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    g = pu.format34_encode(g, res, uci, rnti=0x4601)
    # the DFT-precoded payload stays unit-average-power per used RE
    used = np.asarray(g)[res.start_symbol:, 20 * 12 : (20 + nprb) * 12]
    assert abs(np.mean(np.abs(used) ** 2) - 1.0) < 0.15
    got, ok = pu.format34_decode(_chan(g, rng), res, a, rnti=0x4601)
    assert ok and np.array_equal(got, uci)


@pytest.mark.parametrize("occ_len,occ_idx,a", [(2, 0, 10), (2, 1, 14),
                                               (4, 2, 8)])
def test_pucch_format4_roundtrip(occ_len, occ_idx, a):
    """Format 4: pre-DFT block spreading (38.211 tables 6.3.2.6.3-1/2)."""
    car = NrCarrier(n_prb=52, n_id=55)
    pu = NrPucch(car, slot=7)
    rng = np.random.default_rng(occ_len * 10 + occ_idx)
    res = NrPucchResource(format=4, starting_prb=5, start_symbol=0,
                          nof_symbols=14, occ_length=occ_len,
                          occ_index=occ_idx)
    uci = rng.integers(0, 2, a).astype(np.uint8)
    g = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    g = pu.format34_encode(g, res, uci, rnti=0x777)
    got, ok = pu.format34_decode(_chan(g, rng), res, a, rnti=0x777)
    assert ok and np.array_equal(got, uci)


def test_pucch_format4_multiuser_occ():
    """Two UEs share the SAME PRB/symbols on different OCC indices: the
    despreader + cyclic-shifted DMRS separate them (the point of format 4,
    pucch_nr.c format 4 spreading)."""
    car = NrCarrier(n_prb=52, n_id=55)
    pu = NrPucch(car, slot=7)
    rng = np.random.default_rng(11)
    mk = lambda i: NrPucchResource(format=4, starting_prb=5, start_symbol=0,
                                   nof_symbols=14, occ_length=2, occ_index=i)
    u1 = rng.integers(0, 2, 8).astype(np.uint8)
    u2 = rng.integers(0, 2, 8).astype(np.uint8)
    z = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    g = pu.format34_encode(z, mk(0), u1, rnti=0x100) \
        + pu.format34_encode(z, mk(1), u2, rnti=0x200)
    rx = _chan(g, rng)
    got1, ok1 = pu.format34_decode(rx, mk(0), 8, rnti=0x100)
    got2, ok2 = pu.format34_decode(rx, mk(1), 8, rnti=0x200)
    assert ok1 and np.array_equal(got1, u1)
    assert ok2 and np.array_equal(got2, u2)

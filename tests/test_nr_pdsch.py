"""NR PDSCH chain tests (sch_nr.c / pdsch_nr.c / dmrs_sch.c analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.nr import (NrCarrier, NrDlschConfig, NrPdsch, nr_cbsegm,
                               nr_dlsch_decode, nr_dlsch_encode)


def test_cbsegm_rules():
    s = nr_cbsegm(200, 0.3)
    assert s.bg == 2 and s.C == 1 and s.tb_crc_len == 16 and s.cb_crc_len == 0
    s = nr_cbsegm(8000, 0.7)
    assert s.bg == 1 and s.tb_crc_len == 24
    # segmentation kicks in past Kcb
    s = nr_cbsegm(20000, 0.7)
    assert s.bg == 1 and s.C >= 3 and s.cb_crc_len == 24
    assert s.K >= s.K_prime and s.F == s.K - s.K_prime
    # BG2 Kb selection
    assert nr_cbsegm(100, 0.2).bg == 2


@pytest.mark.parametrize("tbs,rate,qm", [(256, 0.31, 2), (3000, 0.5, 4)])
def test_nr_dlsch_roundtrip(tbs, rate, qm):
    seg = nr_cbsegm(tbs, rate)
    if (tbs + seg.tb_crc_len) % seg.C:
        pytest.skip("tbs not divisible for this toy config")
    g = int(tbs / rate) // qm * qm
    cfg = NrDlschConfig(tbs=tbs, G=g, Qm=qm, rate=rate)
    rng = np.random.default_rng(tbs)
    bits = rng.integers(0, 2, (2, tbs)).astype(np.uint8)
    coded = nr_dlsch_encode(jnp.asarray(bits), cfg)
    assert coded.shape == (2, g)
    llr = (2.0 * np.asarray(coded) - 1.0) * 6
    out, ok = nr_dlsch_decode(jnp.asarray(llr.astype(np.float32)), cfg)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_nr_pdsch_e2e_awgn():
    carrier = NrCarrier(n_prb=24, n_id=17)
    pdsch = NrPdsch(carrier, mcs_qm=4, rate=0.4, rnti=0x4601, slot=3)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (2, pdsch.tbs)).astype(np.uint8)
    grid = pdsch.encode(jnp.asarray(bits))
    assert grid.shape == (2, 14, carrier.nof_re)
    h = 0.8 * np.exp(1j * 0.9)
    rx = h * np.asarray(grid)
    rx += 0.05 * (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape))
    out, ok, info = pdsch.decode(jnp.asarray(rx.astype(np.complex64)))
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_nr_dlsch_multi_cb():
    """Large TB: several LDPC code blocks decode as one batch (no PHY grid
    to keep CPU compile time in check; the e2e path is covered above)."""
    tbs, rate, qm = 9600, 0.5, 2
    seg = nr_cbsegm(tbs, rate)
    assert seg.C == 2 and seg.cb_crc_len == 24
    assert (tbs + seg.tb_crc_len) % seg.C == 0
    g = int(tbs / rate) // qm * qm
    cfg = NrDlschConfig(tbs=tbs, G=g, Qm=qm, rate=rate)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (tbs,)).astype(np.uint8)
    coded = nr_dlsch_encode(jnp.asarray(bits[None]), cfg)
    llr = (2.0 * np.asarray(coded) - 1.0) * 4
    llr += 0.8 * rng.standard_normal(llr.shape).astype(np.float32)
    out, ok = nr_dlsch_decode(jnp.asarray(llr.astype(np.float32)), cfg,
                              n_iter=8)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(out)[0], bits)


def test_nr_dmrs_cinit():
    from srslte_tpu.phy.nr.dmrs import dmrs_cinit

    # formula structure: depends on slot, symbol, and cell id
    a = dmrs_cinit(0, 2, 1)
    b = dmrs_cinit(1, 2, 1)
    c = dmrs_cinit(0, 2, 2)
    assert len({a, b, c}) == 3
    assert a == ((1 << 17) * 3 * 3 + 2) % (1 << 31)

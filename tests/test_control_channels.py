"""Control channel tests: REG geometry, PCFICH, PHICH, PBCH, PDCCH+DCI.

Analog of the reference's lib/src/phy/phch/test/{pcfich_test, phich_test,
pbch_test, pdcch_test} self-checking loops: encode -> grid -> OFDM -> channel
-> decode -> compare.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.chest.refsignal_dl import crs_mask
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.enb.enb_dl import EnbDl
from srslte_tpu.phy.phch.dci import (Dci0, Dci1, Dci1A, format0_1a_size,
                                     format1_size, pack_format0, pack_format1,
                                     pack_format1a, unpack_format0,
                                     unpack_format1, unpack_format1a)
from srslte_tpu.phy.phch.pbch import Mib, Pbch
from srslte_tpu.phy.phch.pcfich import Pcfich
from srslte_tpu.phy.phch.pdcch import Location, Pdcch, common_locations, ue_locations
from srslte_tpu.phy.phch.phich import Phich
from srslte_tpu.phy.phch.regs import nof_ctrl_symbols, reg_layout
from srslte_tpu.phy.ue.ue_dl import UeDl


# ------------------------------------------------------------------ REGs
@pytest.mark.parametrize("n_prb,cell_id,ports", [(6, 0, 1), (25, 77, 2),
                                                 (50, 501, 1), (100, 123, 2)])
def test_reg_layout_disjoint_and_counts(n_prb, cell_id, ports):
    cell = Cell(n_prb=n_prb, id=cell_id, nof_ports=ports)
    lay = reg_layout(cell)
    nre = cell.ofdm.nof_re
    assert lay.pcfich_re.shape == (16,)
    assert np.all(lay.pcfich_re < nre)  # symbol 0
    # PHICH Ng=1: ceil(n_prb/8) groups, all symbol 0
    assert lay.ngroups_phich == -(-n_prb // 8)
    assert np.all(lay.phich_re < nre)
    crs = crs_mask(cell)
    for cfi in (1, 2, 3):
        idx = lay.pdcch_re[cfi]
        nctrl = nof_ctrl_symbols(cell, cfi)
        assert len(idx) == lay.n_cce[cfi] * 36
        assert np.all(idx < nctrl * nre)
        # PCFICH/PHICH/PDCCH/CRS all disjoint
        all_idx = np.concatenate([lay.pcfich_re, lay.phich_re.reshape(-1), idx])
        assert len(np.unique(all_idx)) == len(all_idx)
        sym, k = all_idx // nre, all_idx % nre
        assert not crs[sym, k].any()


def test_reg_layout_cce_count_100prb():
    # 100 PRB, CFI 1, Ng=1: 200 REGs in symbol 0 minus 4 PCFICH minus 39 PHICH
    cell = Cell(n_prb=100, id=0, nof_ports=1)
    lay = reg_layout(cell)
    assert lay.n_cce[1] == (200 - 4 - 3 * 13) // 9


# ------------------------------------------------------------------ PCFICH
@pytest.mark.parametrize("ports", [1, 2])
def test_pcfich_roundtrip(ports):
    cell = Cell(n_prb=15, id=11, nof_ports=ports)
    enb, ue = EnbDl(cell), UeDl(cell)
    rng = np.random.default_rng(0)
    for cfi in (1, 2, 3):
        g = enb.put_base(enb.empty_grids(), sf_idx=2)
        g = enb.put_pcfich(g, 2, cfi)
        s = enb.gen_signal(g)
        rx = s.sum(axis=-2) if ports == 2 else s[..., 0, :]
        noise = 0.01 * (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape))
        grid, ce, info = ue.fft_estimate(jnp.asarray(np.asarray(rx) + noise), 2)
        got, conf = Pcfich(cell, 2).decode(grid, ce)
        assert int(got) == cfi
        assert float(conf) > 0.5


# ------------------------------------------------------------------ PHICH
def test_phich_roundtrip_all_sequences():
    cell = Cell(n_prb=25, id=5, nof_ports=1)
    enb, ue = EnbDl(cell), UeDl(cell)
    ph = Phich(cell, 4)
    rng = np.random.default_rng(1)
    ack = rng.integers(0, 2, (ph.ngroups, 8)).astype(np.int32)
    g = enb.put_base(enb.empty_grids(), sf_idx=4)
    g = enb.put_phich(g, 4, jnp.asarray(ack))
    s = enb.gen_signal(g)[..., 0, :]
    grid, ce, _ = ue.fft_estimate(s, 4)
    got, metric = ph.decode(grid, ce)
    np.testing.assert_array_equal(np.asarray(got).astype(np.int32), ack)
    # amplitudes should be ~1/sqrt(2) scaled BPSK
    assert np.all(np.abs(np.abs(np.asarray(metric)) - 1.0) < 0.2)


# ------------------------------------------------------------------ PBCH
@pytest.mark.parametrize("ports", [1, 2])
@pytest.mark.parametrize("phase", [0, 1, 3])
def test_pbch_roundtrip(ports, phase):
    cell = Cell(n_prb=6, id=151, nof_ports=ports)
    enb, ue = EnbDl(cell), UeDl(cell)
    mib = Mib(n_prb=50, phich_length="norm", phich_resources="1",
              sfn=344 + phase)
    g = enb.put_base(enb.empty_grids(), sf_idx=0)
    g = enb.put_pbch(g, mib)
    s = enb.gen_signal(g)
    rng = np.random.default_rng(7)
    h = np.array([0.9 * np.exp(0.4j), 0.7 * np.exp(-0.9j)], np.complex64)[:ports]
    rx = (h[:, None] * np.asarray(s)).sum(axis=0)
    rx += 0.02 * (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape))
    grid, ce, _ = ue.fft_estimate(jnp.asarray(rx.astype(np.complex64)), 0)
    ok, bits, got_phase, got_ports = Pbch(cell).decode(grid, ce)
    assert ok
    assert got_phase == (344 + phase) % 4
    assert got_ports == ports
    got = Mib.unpack(bits)
    assert got.n_prb == 50 and got.sfn == 344  # sfn rounded to 4-frame period
    assert got.phich_resources == "1"


def test_mib_pack_unpack():
    for mib in [Mib(6, "norm", "1/6", 0), Mib(100, "ext", "2", 1020)]:
        got = Mib.unpack(mib.pack())
        assert got == Mib(mib.n_prb, mib.phich_length, mib.phich_resources,
                          (mib.sfn >> 2) << 2)


# ------------------------------------------------------------------ DCI
def test_dci_pack_unpack_roundtrip():
    for n_prb in (6, 25, 50, 100):
        d = Dci1A(rb_start=1, l_crb=min(4, n_prb - 1), mcs=17, harq_pid=5,
                  ndi=1, rv=2, tpc=3)
        bits = pack_format1a(d, n_prb)
        assert len(bits) == format0_1a_size(n_prb)
        assert unpack_format1a(bits, n_prb) == d

        d0 = Dci0(rb_start=2, l_crb=3, mcs_rv=11, ndi=1, tpc=2, dmrs_cshift=4)
        bits0 = pack_format0(d0, n_prb)
        assert len(bits0) == format0_1a_size(n_prb)
        assert unpack_format0(bits0, n_prb) == d0
        assert unpack_format1a(bits0, n_prb) is None  # flag distinguishes

        n_rbg = len(Dci1(0, 0).grant(n_prb).prb_mask)  # smoke
        d1 = Dci1(rbg_bitmask=0b101, mcs=9, harq_pid=1, ndi=0, rv=1, tpc=0)
        bits1 = pack_format1(d1, n_prb)
        assert len(bits1) == format1_size(n_prb)
        assert unpack_format1(bits1, n_prb) == d1


# ------------------------------------------------------------------ PDCCH
def test_search_space_properties():
    for n_cce in (5, 12, 21, 43):
        for rnti in (0x46, 0x1234):
            locs = ue_locations(n_cce, rnti, sf_idx=3)
            for l in locs:
                assert l.cce + l.L <= n_cce
                assert l.cce % l.L == 0
        for l in common_locations(n_cce):
            assert l.L in (4, 8) and l.cce + l.L <= min(n_cce, 16)


@pytest.mark.parametrize("ports,L", [(1, 1), (1, 4), (2, 2)])
def test_pdcch_blind_search_roundtrip(ports, L):
    cell = Cell(n_prb=25, id=33, nof_ports=ports)
    enb, ue = EnbDl(cell), UeDl(cell)
    rnti, sf_idx, cfi = 0x5A5, 6, 2
    pd = Pdcch(cell, cfi, sf_idx)
    locs = [l for l in ue_locations(pd.n_cce, rnti, sf_idx) if l.L == L]
    assert locs
    dci = Dci1A(rb_start=3, l_crb=10, mcs=12, harq_pid=2, ndi=1)
    payload = pack_format1a(dci, cell.n_prb)

    g = enb.put_base(enb.empty_grids(), sf_idx)
    g = enb.put_pdcch(g, sf_idx, cfi, payload, rnti, locs[0])
    s = enb.gen_signal(g)
    rng = np.random.default_rng(4)
    h = np.array([1.0, 0.8 * np.exp(1.1j)], np.complex64)[:ports]
    rx = (h[:, None] * np.asarray(s)).sum(axis=0)
    rx += 0.02 * (rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape))
    grid, ce, _ = ue.fft_estimate(jnp.asarray(rx.astype(np.complex64)), sf_idx)

    hits = pd.search(grid, ce, rnti, len(payload))
    assert any(l == locs[0] for l, _ in hits)
    for l, bits in hits:
        if l == locs[0]:
            assert unpack_format1a(bits, cell.n_prb) == dci

    # wrong RNTI must find nothing
    assert not pd.search(grid, ce, 0x111, len(payload))


# ------------------------------------------------------ PHICH extended duration
def test_reg_layout_extended_phich_duration():
    """Extended duration: quadruplet i of each group sits in symbol i
    (36.211 table 6.9.3-1, regs.c regs_phich_init)."""
    cell = Cell(n_prb=50, id=77, nof_ports=2, phich_length="ext")
    lay = reg_layout(cell)
    nre = cell.ofdm.nof_re
    assert lay.ngroups_phich == -(-50 // 8)
    sym = lay.phich_re // nre
    for i in range(3):
        assert np.all(sym[:, 4 * i : 4 * i + 4] == i)
    # disjoint from PCFICH and the CFI-3 PDCCH region, off CRS
    all_idx = np.concatenate([lay.pcfich_re, lay.phich_re.reshape(-1),
                              lay.pdcch_re[3]])
    assert len(np.unique(all_idx)) == len(all_idx)
    crs = crs_mask(cell)
    s, k = all_idx // nre, all_idx % nre
    assert not crs[s, k].any()


def test_phich_roundtrip_extended_duration():
    cell = Cell(n_prb=25, id=5, nof_ports=1, phich_length="ext")
    enb, ue = EnbDl(cell), UeDl(cell)
    ph = Phich(cell, 4)
    rng = np.random.default_rng(3)
    ack = rng.integers(0, 2, (ph.ngroups, 8)).astype(np.int32)
    g = enb.put_base(enb.empty_grids(), sf_idx=4)
    g = enb.put_phich(g, 4, jnp.asarray(ack))
    s = enb.gen_signal(g)[..., 0, :]
    grid, ce, _ = ue.fft_estimate(s, 4)
    got, _ = ph.decode(grid, ce)
    np.testing.assert_array_equal(np.asarray(got).astype(np.int32), ack)

"""DCI formats 1B/1C/1D/2/2A/2B and the allocation types they carry.

Reference behavior: lib/src/phy/phch/dci.c (pack/unpack + sizeof) and
ra_dl.c type-1 / distributed type-2 VRB->PRB mapping.
"""

import numpy as np
import pytest

from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.modem.modem import Modulation
from srslte_tpu.phy.phch import dci as D
from srslte_tpu.phy.phch.ra import (TBS_FORMAT1C, DlGrant, dist_vrb_to_prb,
                                    rbg_size, type1_nbits, type2_n_rb_step,
                                    type2_n_vrb_dl, type2_ngap)

NPRBS = [6, 15, 25, 50, 75, 100]


# -- sizes ------------------------------------------------------------------

@pytest.mark.parametrize("n_prb", NPRBS)
def test_sizes_disambiguated_and_distinct(n_prb):
    for n_ports in (1, 2, 4):
        s1b = D.format1b_size(n_prb, n_ports)
        assert s1b not in D.AMBIGUOUS_SIZES
        assert s1b >= D._format0_raw_size(n_prb)
        for sz in (D.format2_size(n_prb, n_ports),
                   D.format2a_size(n_prb, n_ports),
                   D.format2b_size(n_prb, n_ports)):
            assert sz not in D.AMBIGUOUS_SIZES
    # 1C is the smallest of all formats (compact broadcast grant)
    assert D.format1c_size(n_prb) < D.format0_1a_size(n_prb)
    # 2 carries more precoding bits than 2A, which carries >= 2B
    assert D.format2_size(n_prb, 2) >= D.format2a_size(n_prb, 2)
    assert D.format2a_size(n_prb, 4) >= D.format2b_size(n_prb, 4)


def test_sizes_known_values():
    # spot values computed from the 36.212 field widths (dci.c sizeof rules)
    # 100 PRB, 2 ports: 1C = 1 gap + riv(ceil(log2(24*25/2))) + 5 = 1+9+5
    assert D.format1c_size(100) == 15
    # 100 PRB: raw f0 = 14 + 13 = 27; 1B fields = 1+13+5+3+1+2+2+2+1 = 30
    assert D.format1b_size(100, 2) == 30
    # 100 PRB, 2 ports, format 2: 1 + 25 + 2 + 3 + 1 + 16 + 3 = 51
    assert D.format2_size(100, 2) == 51
    assert D.format2a_size(100, 2) == 48
    # 25 PRB f2a, 2 ports: 1 + 13 + 2 + 3 + 1 + 16 + 0 = 36
    assert D.format2a_size(25, 2) == 36


# -- roundtrips -------------------------------------------------------------

@pytest.mark.parametrize("n_prb", NPRBS)
@pytest.mark.parametrize("n_ports", [2, 4])
def test_format1b_1d_roundtrip(n_prb, n_ports):
    d = D.Dci1B(rb_start=1, l_crb=min(4, n_prb - 1), mcs=11, harq_pid=3,
                ndi=1, rv=2, tpc=1, tpmi=n_ports - 1, pconf=1)
    bits = D.pack_format1b(d, n_prb, n_ports)
    assert len(bits) == D.format1b_size(n_prb, n_ports)
    assert D.unpack_format1b(bits, n_prb, n_ports) == d

    d2 = D.Dci1D(rb_start=0, l_crb=2, mcs=5, tpmi=1, power_offset=1)
    bits = D.pack_format1d(d2, n_prb, n_ports)
    assert D.unpack_format1d(bits, n_prb, n_ports) == d2


@pytest.mark.parametrize("n_prb", [50, 75, 100])
def test_format1b_distributed_roundtrip(n_prb):
    n_vrb = type2_n_vrb_dl(n_prb, True)
    d = D.Dci1B(rb_start=2, l_crb=min(6, n_vrb - 2), mcs=9, dist=1)
    bits = D.pack_format1b(d, n_prb, 2)
    got = D.unpack_format1b(bits, n_prb, 2)
    assert got == d
    g = got.grant(n_prb)
    assert g.prb_mask_slot1 is not None
    assert sum(g.prb_mask) == d.l_crb and sum(g.prb_mask_slot1) == d.l_crb


@pytest.mark.parametrize("n_prb", NPRBS)
def test_format1c_roundtrip_and_grant(n_prb):
    step = type2_n_rb_step(n_prb)
    n_vrb = type2_n_vrb_dl(n_prb, True) // step
    d = D.Dci1C(rb_start=1, l_crb=min(3, n_vrb - 1), mcs=7)
    bits = D.pack_format1c(d, n_prb)
    assert len(bits) == D.format1c_size(n_prb)
    got = D.unpack_format1c(bits, n_prb)
    assert got == d
    g = got.grant(n_prb)
    assert g.tbs == TBS_FORMAT1C[7]
    assert g.modulation == Modulation.QPSK
    assert sum(g.prb_mask) == d.l_crb * step


@pytest.mark.parametrize("n_prb", NPRBS)
@pytest.mark.parametrize("fmt,pack,unpack", [
    ("2", D.pack_format2, D.unpack_format2),
    ("2a", D.pack_format2a, D.unpack_format2a),
    ("2b", D.pack_format2b, D.unpack_format2b),
])
def test_format2x_roundtrip_type0(n_prb, fmt, pack, unpack):
    n_rbg = -(-n_prb // rbg_size(n_prb))
    d = D.Dci2(rbg_bitmask=(1 << n_rbg) - 1, mcs=(17, 12), rv=(1, 3),
               ndi=(1, 0), harq_pid=5, tpc=2, swap=1, pinfo=2)
    for n_ports in (2, 4):
        if fmt == "2b" and n_ports == 2:
            dd = d
        else:
            dd = d
        bits = pack(dd, n_prb, n_ports)
        got = unpack(bits, n_prb, n_ports)
        pb = {"2": D.precoding_bits_f2, "2a": D.precoding_bits_f2a,
              "2b": lambda _: 0}[fmt](n_ports)
        want = dd if pb else D.Dci2(dd.rbg_bitmask, dd.mcs, dd.rv, dd.ndi,
                                    dd.harq_pid, dd.tpc, dd.swap, 0)
        assert got == want
    g0, g1 = d.grants(n_prb)
    assert g0.mcs == 17 and g1.mcs == 12
    assert g0.prb_mask == g1.prb_mask
    assert sum(g0.prb_mask) == n_prb  # full bitmap


@pytest.mark.parametrize("n_prb", [25, 50, 100])
def test_format2_roundtrip_type1(n_prb):
    p = rbg_size(n_prb)
    nb = type1_nbits(n_prb)
    d = D.Dci2(rbg_bitmask=(1 << nb) - 1, mcs=(10, 10), alloc_type=1,
               rbg_subset=1, shift=1)
    bits = D.pack_format2(d, n_prb, 2)
    got = D.unpack_format2(bits, n_prb, 2)
    assert got == d
    g0, _ = got.grants(n_prb)
    # every allocated PRB belongs to RBG subset 1
    for i, used in enumerate(g0.prb_mask):
        if used:
            assert (i // p) % p == 1
    assert 0 < g0.n_prb <= nb


def test_tb_disabled_marker():
    d = D.Dci2(rbg_bitmask=1, mcs=(15, 0), rv=(0, 1))
    assert d.tb_enabled(0) and not d.tb_enabled(1)


# -- distributed VRB -> PRB mapping ----------------------------------------

@pytest.mark.parametrize("n_prb", NPRBS)
@pytest.mark.parametrize("ngap_is_1", [True, False])
def test_dist_mapping_bijective_and_in_gap_blocks(n_prb, ngap_is_1):
    if n_prb < 50 and not ngap_is_1:
        pytest.skip("second gap defined only for >=50 PRB")
    n_vrb = (type2_n_vrb_dl(n_prb, True) if ngap_is_1
             else 2 * type2_ngap(n_prb, False))
    m0, m1 = dist_vrb_to_prb(n_prb, 0, n_vrb, ngap_is_1)
    # full allocation: bijective onto n_vrb PRBs in each slot
    assert m0.sum() == n_vrb and m1.sum() == n_vrb
    gap = type2_ngap(n_prb, ngap_is_1)
    allowed = np.zeros(n_prb, bool)
    allowed[: n_vrb // 2] = True
    allowed[gap : gap + n_vrb // 2] = True
    assert not (m0 & ~allowed).any() and not (m1 & ~allowed).any()


@pytest.mark.parametrize("n_prb", [6, 25, 50, 100])
def test_dist_mapping_slot_hop_identity(n_prb):
    """Slot-1 tilde-PRB == slot-0 tilde-PRB + N_vrb/2 cyclically (36.211
    6.2.3.2: the odd slot reads the interleaver output shifted by half)."""
    n_vrb = type2_n_vrb_dl(n_prb, True)
    gap = type2_ngap(n_prb, True)

    def to_tilde(prb):  # invert the N_gap block expansion
        return prb if prb < n_vrb // 2 else prb - gap + n_vrb // 2

    for v in range(n_vrb):
        m0, m1 = dist_vrb_to_prb(n_prb, v, 1)
        t0 = to_tilde(int(np.where(m0)[0][0]))
        t1 = to_tilde(int(np.where(m1)[0][0]))
        assert t1 == (t0 + n_vrb // 2) % n_vrb, f"VRB {v}"


def test_dist_pdsch_roundtrip():
    """PDSCH on a distributed grant survives the slot-hopped RE map."""
    import jax.numpy as jnp

    from srslte_tpu.phy.phch.pdsch import Pdsch

    cell = Cell(n_prb=50, id=1, nof_ports=1)
    g = DlGrant.type2_dist(50, 0, 6, mcs=10)
    assert g.prb_mask != g.prb_mask_slot1
    p = Pdsch(cell, g, sf_idx=1, cfi=2, rnti=0x46)
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, g.tbs).astype(np.float32))
    o = cell.ofdm
    grids = jnp.zeros((1, o.nsymb_sf, o.nof_re), np.complex64)
    tx = p.encode(bits, grids)
    ce = jnp.ones((1, o.nsymb_sf, o.nof_re), np.complex64)
    out, ok = p.decode(tx[0], ce, 1e-4)
    assert bool(ok)
    assert np.array_equal(np.asarray(out), np.asarray(bits))


# -- blind search e2e for each format --------------------------------------

def _air_tx_rx(cell, build, sf_idx, seed=7):
    """eNB grid -> OFDM -> flat channel + noise -> UE fft/chest."""
    import jax.numpy as jnp

    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.ue.ue_dl import UeDl

    enb, ue = EnbDl(cell), UeDl(cell)
    g = build(enb, enb.put_base(enb.empty_grids(), sf_idx))
    s = enb.gen_signal(g)
    rng = np.random.default_rng(seed)
    h = np.array([1.0, 0.8 * np.exp(1.1j)], np.complex64)[: cell.nof_ports]
    rx = (h[:, None] * np.asarray(s)).sum(axis=0)
    rx += 0.02 * (rng.standard_normal(rx.shape)
                  + 1j * rng.standard_normal(rx.shape))
    return ue.fft_estimate(jnp.asarray(rx.astype(np.complex64)), sf_idx)


@pytest.mark.parametrize("fmt", ["1b", "1c", "1d"])
def test_blind_search_finds_compact_formats(fmt):
    """eNB encodes 1B/1C/1D; UE blind search at that size recovers the DCI
    and the grant decodes the PDSCH payload (ue_dl.c ue_dci_formats rows
    TM5/TM6 + common_formats 1C)."""
    import jax.numpy as jnp

    from srslte_tpu.phy.phch.pdcch import Pdcch, ue_locations
    from srslte_tpu.phy.phch.pdsch import Pdsch

    cell = Cell(n_prb=50, id=7, nof_ports=2)
    rnti, sf_idx, cfi = 0x3C1, 3, 2
    if fmt == "1b":
        d = D.Dci1B(rb_start=4, l_crb=6, mcs=8, tpmi=1)
        payload = D.pack_format1b(d, 50, 2)
        unpack = lambda b: D.unpack_format1b(b, 50, 2)
    elif fmt == "1d":
        d = D.Dci1D(rb_start=4, l_crb=6, mcs=8, tpmi=1, power_offset=1)
        payload = D.pack_format1d(d, 50, 2)
        unpack = lambda b: D.unpack_format1d(b, 50, 2)
    else:
        d = D.Dci1C(rb_start=1, l_crb=2, mcs=5)
        payload = D.pack_format1c(d, 50)
        unpack = lambda b: D.unpack_format1c(b, 50)
    grant = d.grant(50)
    pdsch = Pdsch(cell, grant, sf_idx, cfi=cfi, rnti=rnti)
    rng = np.random.default_rng(3)
    bits = jnp.asarray(rng.integers(0, 2, grant.tbs).astype(np.float32))
    pd = Pdcch(cell, cfi, sf_idx)
    loc = [l for l in ue_locations(pd.n_cce, rnti, sf_idx) if l.L == 4][0]

    def build(enb, g):
        g = enb.put_pdcch(g, sf_idx, cfi, payload, rnti, loc)
        return enb.put_pdsch(g, pdsch, bits)

    grid, ce, info = _air_tx_rx(cell, build, sf_idx)
    hits = pd.search(grid, ce, rnti, len(payload))
    found = [unpack(b) for l, b in hits if l == loc]
    assert found and found[0] == d
    out, ok = pdsch.decode(grid, ce, info["noise"])
    assert bool(ok) and np.array_equal(np.asarray(out), np.asarray(bits))


@pytest.mark.parametrize("fmt", ["2", "2a", "2b"])
def test_blind_search_finds_dual_tb_formats(fmt):
    """eNB encodes DCI 2/2A/2B + 2-layer PDSCH; a 2-RX UE blind-searches the
    TM4/TM3/TM8 size, rebuilds both grants, and decodes both TBs."""
    import jax.numpy as jnp

    from srslte_tpu.phy.chest.chest_dl import ChestDL
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.ofdm import Ofdm
    from srslte_tpu.phy.phch.pdcch import Pdcch, ue_locations
    from srslte_tpu.phy.phch.pdsch import PdschSm

    cell = Cell(n_prb=25, id=9, nof_ports=2)
    rnti, sf_idx, cfi = 0x777, 4, 2
    n_rbg = -(-25 // rbg_size(25))
    d = D.Dci2(rbg_bitmask=(1 << n_rbg) - 1, mcs=(12, 9),
               pinfo=(1 if fmt == "2" else 0))
    pack = {"2": D.pack_format2, "2a": D.pack_format2a,
            "2b": D.pack_format2b}[fmt]
    unpack = {"2": D.unpack_format2, "2a": D.unpack_format2a,
              "2b": D.unpack_format2b}[fmt]
    payload = pack(d, 25, 2)
    g0, g1 = d.grants(25)
    pmi = d.pinfo - 1 if fmt == "2" and d.pinfo else None
    sm = PdschSm(cell, g0, sf_idx, cfi=cfi, rnti=rnti, pmi=pmi, grant1=g1)
    rng = np.random.default_rng(5)
    b0 = jnp.asarray(rng.integers(0, 2, g0.tbs).astype(np.float32))
    b1 = jnp.asarray(rng.integers(0, 2, g1.tbs).astype(np.float32))

    enb = EnbDl(cell)
    grids = enb.put_base(enb.empty_grids(), sf_idx)
    pd = Pdcch(cell, cfi, sf_idx)
    loc = [l for l in ue_locations(pd.n_cce, rnti, sf_idx) if l.L == 8][0]
    grids = enb.put_pdcch(grids, sf_idx, cfi, payload, rnti, loc)
    grids = sm.encode2(b0, b1, grids)
    s = enb.gen_signal(grids)

    # 2x2 well-conditioned flat channel + light noise
    H = np.array([[1.0, 0.3 + 0.2j], [0.25 - 0.3j, 0.9]], np.complex64)
    rng2 = np.random.default_rng(11)
    rx = H @ np.asarray(s)
    rx += 0.01 * (rng2.standard_normal(rx.shape)
                  + 1j * rng2.standard_normal(rx.shape))

    ofdm = Ofdm(cell.ofdm, normalize=True)
    chest = ChestDL(cell)
    grids_rx = ofdm.rx_sf(jnp.asarray(rx.astype(np.complex64)))
    ce0, info0 = chest.estimate(grids_rx[0], sf_idx)
    ce1, info1 = chest.estimate(grids_rx[1], sf_idx)
    ce = jnp.stack([ce0, ce1])  # [2rx, 2tx, nsym, nre]

    hits = pd.search(grids_rx[0], ce[0], rnti, len(payload))
    found = [unpack(b, 25, 2) for l, b in hits if l == loc]
    assert found and found[0] == d

    (o0, ok0), (o1, ok1) = sm.decode2(grids_rx, ce, info0["noise"])
    assert bool(ok0) and bool(ok1)
    assert np.array_equal(np.asarray(o0), np.asarray(b0))
    assert np.array_equal(np.asarray(o1), np.asarray(b1))


def test_per_tb_mcs_sm_roundtrip():
    """TM3 dual-TB with different MCS per TB (DCI 2A tb[0]/tb[1])."""
    import jax.numpy as jnp

    from srslte_tpu.phy.phch.pdsch import PdschSm

    cell = Cell(n_prb=15, id=3, nof_ports=2)
    d = D.Dci2(rbg_bitmask=(1 << 8) - 1, mcs=(14, 8))
    g0, g1 = d.grants(15)
    p = PdschSm(cell, g0, sf_idx=2, cfi=2, rnti=0x50, pmi=None, grant1=g1)
    rng = np.random.default_rng(1)
    b0 = jnp.asarray(rng.integers(0, 2, g0.tbs).astype(np.float32))
    b1 = jnp.asarray(rng.integers(0, 2, g1.tbs).astype(np.float32))
    o = cell.ofdm
    grids = jnp.zeros((2, o.nsymb_sf, o.nof_re), np.complex64)
    tx = p.encode2(b0, b1, grids)
    # ideal 2x2 identity channel
    h = jnp.zeros((2, 2, o.nsymb_sf, o.nof_re), np.complex64)
    h = h.at[0, 0].set(1.0).at[1, 1].set(1.0)
    (o0, ok0), (o1, ok1) = p.decode2(tx, h, 1e-4)
    assert bool(ok0) and bool(ok1)
    assert np.array_equal(np.asarray(o0), np.asarray(b0))
    assert np.array_equal(np.asarray(o1), np.asarray(b1))

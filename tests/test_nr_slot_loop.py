"""NR slot loop: blind DCI-NR decode feeding grant-based PDSCH/PUSCH.

Reference behavior: the srsue/srsenb NR worker path — dci_nr.c 0_0/1_0,
ra_nr.c MCS/TBS determination, pdcch_nr.c blind search, pdsch_nr.c /
pusch_nr.c grant processing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.nr import (Coreset, Dci00, Dci10, NrCarrier, NrGrant,
                               NrPdcch, NrPdsch, NrPusch, NrSearchSpace,
                               dci_00_size, dci_10_size, nr_tbs, pack_dci_00,
                               pack_dci_10, pdcch_nr_locations, unpack_dci_00,
                               unpack_dci_10)
from srslte_tpu.phy.nr.params import NSYMB_SLOT


def test_nr_tbs_known_points():
    # 38.214 §5.1.3.2: small allocations land on table 5.1.3.2-1 entries
    from srslte_tpu.phy.nr.ra_nr import TBS_TABLE_NR

    assert nr_tbs(156, 120 / 1024, 2) in TBS_TABLE_NR
    assert nr_tbs(156 * 4, 679 / 1024, 2) in TBS_TABLE_NR
    # large allocation: 8-byte aligned after the +24 CRC rule
    big = nr_tbs(156 * 100, 948 / 1024, 6)
    assert (big + 24) % 8 == 0 and big > 3824


def test_dci_nr_roundtrip_and_alignment():
    n_bwp = 52
    d1 = Dci10(rb_start=4, l_rb=24, mcs=17, ndi=1, rv=2, harq_pid=9,
               tpc=1, pucch_ri=5, harq_timing=2)
    b1 = pack_dci_10(d1, n_bwp)
    assert len(b1) == dci_10_size(n_bwp)
    assert unpack_dci_10(b1, n_bwp) == d1

    d0 = Dci00(rb_start=0, l_rb=8, mcs=10, ndi=1, harq_pid=3)
    b0 = pack_dci_00(d0, n_bwp, n_bwp)
    # 0_0 is size-aligned with 1_0 (38.212 §7.3.1.0): one blind search size
    assert len(b0) == len(b1)
    assert unpack_dci_00(b0, n_bwp) == d0
    # format identifier separates them
    assert unpack_dci_10(b0, n_bwp) is None
    assert unpack_dci_00(b1, n_bwp) is None


@pytest.mark.parametrize("mcs,table", [(4, "qam64"), (17, "qam64"),
                                       (27, "qam256")])
def test_grant_based_pdsch_roundtrip(mcs, table):
    car = NrCarrier(n_prb=52, n_id=42)
    g = NrGrant(prb_start=8, n_prb=16, mcs=mcs, mcs_table=table)
    p = NrPdsch(car, rnti=0x4601, slot=5, grant=g)
    rng = np.random.default_rng(mcs)
    bits = jnp.asarray(rng.integers(0, 2, g.tbs).astype(np.float32))
    grid = p.encode(bits)
    # selective channel + noise
    k = np.arange(car.nof_re)
    H = 1.0 + 0.4 * np.exp(-2j * np.pi * k * 2 / car.nof_re)
    rx = np.asarray(grid) * H[None, :]
    rx = rx + 0.02 * (rng.standard_normal(rx.shape)
                      + 1j * rng.standard_normal(rx.shape))
    out, ok, info = p.decode(jnp.asarray(rx.astype(np.complex64)))
    assert bool(ok)
    assert np.array_equal(np.asarray(out), np.asarray(bits))


def test_nr_slot_loop_dl_and_ul():
    """One DL slot: PDCCH(1_0)+PDSCH blind-decoded by the UE; the carried
    0_0 UL grant drives a PUSCH slot decoded by the gNB."""
    car = NrCarrier(n_prb=52, n_id=77)
    cs = Coreset.full(48, duration=1, id=0)
    ss = NrSearchSpace(ue_specific=True, nof_candidates=(0, 0, 2, 1, 0))
    rnti, slot = 0x4601, 4
    rng = np.random.default_rng(0)

    # -- gNB builds the DL slot ------------------------------------------
    dl = Dci10(rb_start=0, l_rb=24, mcs=15, harq_pid=1)
    dci_bits = pack_dci_10(dl, car.n_prb)
    pd = NrPdcch(car, cs, slot=slot)
    locs = pdcch_nr_locations(cs, ss, rnti, 2, slot)
    grid = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    grid = pd.encode(grid, dci_bits, rnti, locs[0], 4)
    g_dl = dl.grant(car.n_prb)
    pdsch = NrPdsch(car, rnti=rnti, slot=slot, grant=g_dl)
    payload = rng.integers(0, 2, g_dl.tbs).astype(np.float32)
    grid = grid + pdsch.encode(jnp.asarray(payload))

    # -- over the air -----------------------------------------------------
    h0 = 0.9 * np.exp(0.5j)
    rx = np.asarray(grid) * h0 + 0.02 * (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape))
    rx = jnp.asarray(rx.astype(np.complex64))

    # -- UE: blind DCI search -> PDSCH decode ----------------------------
    hit = pd.search(rx, rnti, dci_10_size(car.n_prb),
                    [(n, 4) for n in locs])
    assert hit is not None
    _, found_bits = hit
    dci = unpack_dci_10(found_bits, car.n_prb)
    assert dci == dl
    g_ue = dci.grant(car.n_prb)
    bits, ok, _ = NrPdsch(car, rnti=rnti, slot=slot, grant=g_ue).decode(rx)
    assert bool(ok) and np.array_equal(np.asarray(bits), payload)

    # -- UL: the 0_0 grant drives a PUSCH slot ---------------------------
    ul = Dci00(rb_start=4, l_rb=12, mcs=9, harq_pid=2)
    g_ul = ul.grant(car.n_prb)
    pusch = NrPusch(car, rnti=rnti, slot=slot + 4, grant=g_ul)
    ul_payload = rng.integers(0, 2, g_ul.tbs).astype(np.float32)
    ul_grid = pusch.encode(jnp.asarray(ul_payload))
    ul_rx = np.asarray(ul_grid) * 0.8 + 0.02 * (
        rng.standard_normal(ul_grid.shape)
        + 1j * rng.standard_normal(ul_grid.shape))
    ul_bits, ul_ok, _ = pusch.decode(jnp.asarray(ul_rx.astype(np.complex64)))
    assert bool(ul_ok) and np.array_equal(np.asarray(ul_bits), ul_payload)


@pytest.mark.parametrize("dmrs_type,add_pos", [(2, 0), (1, 1), (2, 2)])
def test_dmrs_type2_and_additional_positions(dmrs_type, add_pos):
    """Type-2 DMRS (subcarrier pairs) and dmrs-AdditionalPosition multi-
    symbol estimation round-trip (38.211 table 7.4.1.1.2-3)."""
    from srslte_tpu.phy.nr.dmrs import dmrs_subcarriers, dmrs_symbols

    car = NrCarrier(n_prb=52, n_id=21)
    g = NrGrant(prb_start=4, n_prb=20, mcs=14)
    p = NrPdsch(car, rnti=0x4601, slot=6, grant=g,
                dmrs_type=dmrs_type, dmrs_add_pos=add_pos)
    # geometry: type 2 has 4 pilots/PRB in pairs, type 1 has 6 on the comb
    ks = dmrs_subcarriers(car, dmrs_type)
    per_prb = len(ks) / car.n_prb
    assert per_prb == (6 if dmrs_type == 1 else 4)
    assert len(dmrs_symbols(add_pos)) == add_pos + 1
    rng = np.random.default_rng(dmrs_type * 10 + add_pos)
    bits = jnp.asarray(rng.integers(0, 2, g.tbs).astype(np.float32))
    tx = p.encode(bits)
    gtx = np.asarray(tx)
    # every DMRS symbol is populated within the allocation only
    for l in dmrs_symbols(add_pos):
        row = np.abs(gtx[l])
        assert row[4 * 12 : 24 * 12].sum() > 0
        assert row[: 4 * 12].sum() == 0 and row[24 * 12 :].sum() == 0
    k = np.arange(car.nof_re)
    H = 1.0 + 0.35 * np.exp(-2j * np.pi * k * 2 / car.nof_re)
    rx = gtx * H[None, :] + 0.02 * (
        rng.standard_normal(gtx.shape) + 1j * rng.standard_normal(gtx.shape))
    out, ok, _ = p.decode(jnp.asarray(rx.astype(np.complex64)))
    assert bool(ok)
    assert np.array_equal(np.asarray(out), np.asarray(bits))

"""NB-IoT data channels: NPBCH, NPDCCH (DCI N0/N1), NPDSCH.

Reference behavior: lib/src/phy/phch/{npbch.c, npdcch.c, npdsch.c,
dci_nbiot.c, ra_nbiot.c}, ch_estimation/refsignal_dl_nbiot.c.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.nbiot.npbch import MibNb, Npbch, npbch_re_indices
from srslte_tpu.phy.nbiot.npdcch import (DciN0, DciN1, Npdcch, pack_dci_n0,
                                         pack_dci_n1, unpack_dci_n0,
                                         unpack_dci_n1)
from srslte_tpu.phy.nbiot.npdsch import (NbDlGrant, Npdsch, TBS_TABLE_NB,
                                         npdsch_re_indices)
from srslte_tpu.phy.nbiot.nrs import nrs_reserved_sc, nrs_subcarriers, nrs_values


def _chan(g, rng, h0=0.9 * np.exp(0.7j), n=0.02):
    x = np.asarray(g) * h0
    x = x + n * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
    return jnp.asarray(x.astype(np.complex64))


def test_nrs_geometry():
    scs = nrs_subcarriers(n_id=257, port=0)
    assert scs.shape == (4, 2)
    assert ((0 <= scs) & (scs < 12)).all()
    # port 1 uses the swapped v-shift: disjoint from port 0 in each symbol
    scs1 = nrs_subcarriers(257, 1)
    for li in range(4):
        assert not set(scs[li]) & set(scs1[li])
    v = nrs_values(257, sf_idx=4)
    assert np.allclose(np.abs(v), 1.0, atol=1e-6)
    assert not np.allclose(v, nrs_values(258, 4))


def test_npbch_re_count():
    assert len(npbch_re_indices(0)) == 100  # SRSRAN_NPBCH_NUM_RE
    assert len(npbch_re_indices(17)) == 100


@pytest.mark.parametrize("nof_ports,nf", [(1, 0), (1, 25), (2, 40)])
def test_npbch_roundtrip(nof_ports, nf):
    npbch = Npbch(n_id=257, nof_ports=nof_ports)
    mib = MibNb(sfn_msb=5, sched_info_sib1=3, sys_info_tag=7, op_mode=2)
    grids = jnp.zeros((2, 14, 12), np.complex64)
    tx = npbch.encode_frame(mib, nf, grids)
    rng = np.random.default_rng(nf)
    h = np.array([1.0, 0.8 * np.exp(1.2j)], np.complex64)[:nof_ports]
    rx = (h[:, None, None] * np.asarray(tx)[:nof_ports]).sum(0)
    rx = rx + 0.02 * (rng.standard_normal(rx.shape)
                      + 1j * rng.standard_normal(rx.shape))
    ce = jnp.broadcast_to(jnp.asarray(np.array([h[0], h[1] if nof_ports > 1
                                                else 0], np.complex64))[:, None, None],
                          (2, 14, 12))
    ok, got, block = npbch.decode(jnp.asarray(rx.astype(np.complex64)), ce)
    assert ok and block == (nf % 64) // 8
    assert got == mib


def test_dci_nb_roundtrip():
    d1 = DciN1(i_delay=2, i_sf=3, i_mcs=9, i_rep=1, ndi=1, harq_ack=5,
               dci_rep=1)
    assert unpack_dci_n1(pack_dci_n1(d1)) == d1
    assert unpack_dci_n0(pack_dci_n1(d1)) is None
    d0 = DciN0(sc_ind=45, i_ru=2, i_delay=1, i_mcs=7, rv=1, i_rep=2, ndi=1)
    assert unpack_dci_n0(pack_dci_n0(d0)) == d0
    assert unpack_dci_n1(pack_dci_n0(d0)) is None


@pytest.mark.parametrize("ncce,fmt", [(0, 1), (0, 0), (1, 0)])
def test_npdcch_blind_search(ncce, fmt):
    pd = Npdcch(n_id=100, sf_idx=4)
    rnti = 0x2345
    d = DciN1(i_sf=2, i_mcs=6, ndi=1)
    payload = pack_dci_n1(d)
    grids = jnp.zeros((1, 14, 12), np.complex64)
    tx = pd.encode(grids, payload, rnti, ncce=ncce, fmt=fmt)
    rng = np.random.default_rng(fmt * 2 + ncce)
    rx = _chan(tx[0], rng)
    ce = jnp.full((1, 14, 12), 0.9 * np.exp(0.7j), jnp.complex64)
    hit = pd.search(rx, ce, rnti)
    assert hit is not None
    (got_ncce, got_fmt), dci = hit
    assert (got_ncce, got_fmt) == (ncce, fmt)
    assert dci == d
    # wrong RNTI finds nothing
    assert pd.search(rx, ce, 0x1111) is None


def test_tbs_table_invalid_combo():
    g = NbDlGrant(i_tbs=12, i_sf=7)
    with pytest.raises(ValueError):
        _ = g.tbs
    assert NbDlGrant(i_tbs=12, i_sf=2).tbs == 680


@pytest.mark.parametrize("i_tbs,i_sf", [(4, 0), (9, 3), (12, 2)])
def test_npdsch_multi_subframe_roundtrip(i_tbs, i_sf):
    grant = NbDlGrant(i_tbs=i_tbs, i_sf=i_sf)
    p = Npdsch(n_id=100, grant=grant, rnti=0x2345)
    rng = np.random.default_rng(i_tbs)
    bits = jnp.asarray(rng.integers(0, 2, grant.tbs).astype(np.float32))
    sf_nf = tuple((4 + i, 10 + (4 + i) // 10) for i in range(grant.nof_sf))
    grids = [jnp.zeros((1, 14, 12), np.complex64)] * grant.nof_sf
    txs = p.encode(bits, grids, sf_nf)
    h0 = 0.85 * np.exp(0.5j)
    rxs = jnp.stack([_chan(t[0], rng, h0) for t in txs])
    ces = jnp.full((grant.nof_sf, 1, 14, 12), h0, jnp.complex64)
    out, ok = p.decode(rxs, ces, sf_nf)
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(out), np.asarray(bits))


def test_npdsch_n1_grant_flow():
    """DCI N1 -> NbDlGrant -> NPDSCH decode (the NB-IoT DL data path)."""
    pd = Npdcch(n_id=17, sf_idx=1)
    rnti = 0x0AB
    d = DciN1(i_sf=1, i_mcs=5, ndi=1)
    tx_ctrl = pd.encode(jnp.zeros((1, 14, 12), np.complex64),
                        pack_dci_n1(d), rnti)
    rng = np.random.default_rng(0)
    ce1 = jnp.full((1, 14, 12), 0.9 + 0j, jnp.complex64)
    hit = pd.search(_chan(tx_ctrl[0], rng, 0.9), ce1, rnti)
    assert hit is not None
    dci = hit[1]
    grant = NbDlGrant(i_tbs=dci.i_mcs, i_sf=dci.i_sf)
    p = Npdsch(n_id=17, grant=grant, rnti=rnti)
    bits = jnp.asarray(rng.integers(0, 2, grant.tbs).astype(np.float32))
    sf_nf = tuple((5 + i, 10) for i in range(grant.nof_sf))
    txs = p.encode(bits, [jnp.zeros((1, 14, 12), np.complex64)] * grant.nof_sf,
                   sf_nf)
    rxs = jnp.stack([_chan(t[0], rng, 0.9) for t in txs])
    ces = jnp.full((grant.nof_sf, 1, 14, 12), 0.9 + 0j, jnp.complex64)
    out, ok = p.decode(rxs, ces, sf_nf)
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(out), np.asarray(bits))

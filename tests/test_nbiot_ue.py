"""NB-IoT UE-level chain: sync -> cell search -> MIB -> NPDCCH -> NPDSCH.

Reference behavior: lib/src/phy/ue/{ue_sync_nbiot.c, ue_cell_search_nbiot.c,
ue_mib_nbiot.c, ue_dl_nbiot.c} driven the way lib/examples/npdsch_ue.c does.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.nbiot.npbch import MibNb
from srslte_tpu.phy.nbiot.npdcch import DciN1, Npdcch, pack_dci_n1
from srslte_tpu.phy.nbiot.npdsch import NbDlGrant, Npdsch
from srslte_tpu.phy.nbiot.ue import (NbEnbDl, NbOfdm, UeCellSearchNbiot,
                                     UeDlNbiot, UeMibNbiot, UeSyncNbiot,
                                     cfo_correct, nb_chest)

N_ID = 257
RNTI = 0x2345
SF_LEN = 1920


def _capture(nframes=4, nof_ports=1, seed=0, dci_frame=1):
    """Generate an eNB frame stream with one DCI N1 + NPDSCH transmission."""
    rng = np.random.default_rng(seed)
    enb = NbEnbDl(N_ID, nof_ports)
    mib = MibNb(sfn_msb=5, sched_info_sib1=3, sys_info_tag=7, op_mode=2)
    dci = DciN1(i_sf=1, i_mcs=5, ndi=1)
    grant = NbDlGrant(i_tbs=dci.i_mcs, i_sf=dci.i_sf)
    bits = rng.integers(0, 2, grant.tbs).astype(np.float32)
    npdsch = Npdsch(N_ID, grant, RNTI)
    # DCI in sf 1 of dci_frame; data in sf 3.. of the same frame
    data_sfs = tuple(3 + i for i in range(grant.nof_sf))
    sf_nf = tuple((s, dci_frame) for s in data_sfs)

    def put_dci(g):
        pd = Npdcch(N_ID, sf_idx=1)
        return pd.encode(g, pack_dci_n1(dci), RNTI)

    tx_grids = npdsch.encode(jnp.asarray(bits),
                             [jnp.zeros((2, 14, 12), np.complex64)
                              for _ in data_sfs], sf_nf)

    frames = []
    for nf in range(nframes):
        data = {}
        if nf == dci_frame:
            data[1] = put_dci
            for i, s in enumerate(data_sfs):
                data[s] = lambda g, i=i: g + tx_grids[i]
        frames.append(enb.frame_signal(mib, nf, data))
    sig = jnp.concatenate(frames)
    return sig, mib, dci, grant, bits, sf_nf


def _impair(sig, delay, cfo_hz, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    x = np.asarray(sig)
    n = np.arange(len(x))
    x = x * np.exp(2j * np.pi * cfo_hz * n / 1.92e6)
    p = np.mean(np.abs(x[np.abs(x) > 0]) ** 2)
    sigma = np.sqrt(p / 10 ** (snr_db / 10) / 2)
    noise = sigma * (rng.standard_normal(len(x) + delay)
                     + 1j * rng.standard_normal(len(x) + delay))
    out = noise.astype(np.complex64)
    out[delay:] += x.astype(np.complex64)
    return jnp.asarray(out)


def test_nb_ofdm_roundtrip():
    rng = np.random.default_rng(0)
    g = jnp.asarray((rng.standard_normal((14, 12))
                     + 1j * rng.standard_normal((14, 12))).astype(np.complex64))
    m = NbOfdm()
    back = m.rx_sf(m.tx_sf(g))
    # unnormalized DL convention: round trip scales by N
    np.testing.assert_allclose(np.asarray(back) / m.params.symbol_sz,
                               np.asarray(g), atol=1e-4)


def test_nb_chest_flat_channel():
    enb = NbEnbDl(N_ID, nof_ports=1)
    g = enb._put_nrs(jnp.zeros((2, 14, 12), jnp.complex64), sf_idx=3)
    h0 = 0.8 * np.exp(0.9j)
    rx = g[0] * h0
    ce, noise = nb_chest(rx, N_ID, 3)
    assert abs(complex(np.asarray(ce[0, 0, 0])) - h0) < 1e-5
    assert float(np.asarray(noise)) < 1e-9
    # port-1 estimate is ~0 when only port 0 transmits
    assert abs(complex(np.asarray(ce[1, 0, 0]))) < 1e-6


def test_nb_sync_find_and_cfo():
    sig, *_ = _capture(nframes=2)
    delay = 777
    rx = _impair(sig, delay, cfo_hz=150.0, snr_db=12)
    sync = UeSyncNbiot()
    sf0, cfo, metric = sync.find(rx)
    assert (sf0 - delay) % (10 * SF_LEN) <= 1 or (delay - sf0) % (10 * SF_LEN) <= 1
    assert abs(cfo - 150.0) < 30.0
    assert metric > 0.05


def test_nb_cell_search():
    sig, *_ = _capture(nframes=4)
    rx = _impair(sig, delay=501, cfo_hz=80.0, snr_db=10)
    cs = UeCellSearchNbiot()
    got = cs.search(rx)
    assert got is not None
    assert got["n_id"] == N_ID
    # sf0_offset lands on an even frame boundary: frame_pos consistency
    assert (got["sf0_offset"] - 501) % (20 * SF_LEN) in (0, 1, 20 * SF_LEN - 1)
    assert got["frame_pos"] == 0


@pytest.mark.parametrize("nof_ports", [1, 2])
def test_nb_mib_decode(nof_ports):
    sig, mib, *_ = _capture(nframes=3, nof_ports=nof_ports)
    rx = _impair(sig, delay=0, cfo_hz=0.0, snr_db=14)
    sf0s = jnp.stack([rx[nf * 10 * SF_LEN : nf * 10 * SF_LEN + SF_LEN]
                      for nf in range(3)])
    ok, got, block, frame = UeMibNbiot(N_ID).decode(sf0s)
    assert ok
    assert got == mib
    assert block == frame // 8  # nf mod 64 // 8


def test_nb_full_chain():
    """Capture -> sync -> cell id -> MIB -> DCI N1 -> NPDSCH payload."""
    sig, mib, dci, grant, bits, sf_nf = _capture(nframes=4, dci_frame=1)
    delay = 1234
    rx = _impair(sig, delay, cfo_hz=120.0, snr_db=12)

    got = UeCellSearchNbiot().search(rx)
    assert got is not None and got["n_id"] == N_ID
    x = cfo_correct(rx, got["cfo_hz"])
    sf0 = got["sf0_offset"] % (20 * SF_LEN)

    ue = UeDlNbiot(N_ID)
    # MIB from frame 0's subframe 0
    g, ce, _ = ue.fft_estimate(x[sf0 : sf0 + SF_LEN], 0)
    from srslte_tpu.phy.nbiot.npbch import Npbch
    ok, got_mib, block = Npbch(N_ID, 2).decode(g, ce)
    assert ok and got_mib == mib

    # frame 1: NPDCCH in sf 1
    base = sf0 + 10 * SF_LEN
    s1 = base + 1 * SF_LEN
    g1, ce1, _ = ue.fft_estimate(x[s1 : s1 + SF_LEN], 1)
    hit = ue.search_npdcch(g1, ce1[:1], RNTI, sf_idx=1)
    assert hit is not None
    _, got_dci = hit
    assert got_dci == dci

    # NPDSCH subframes 3.. of frame 1
    got_grant = NbDlGrant(i_tbs=got_dci.i_mcs, i_sf=got_dci.i_sf)
    assert got_grant == grant
    grids, ces = [], []
    for sf_idx, _nf in sf_nf:
        s = base + sf_idx * SF_LEN
        gd, ced, _ = ue.fft_estimate(x[s : s + SF_LEN], sf_idx)
        grids.append(gd)
        ces.append(ced)
    out, ok = ue.decode_npdsch(jnp.stack(grids), jnp.stack(ces), sf_nf,
                               got_grant, RNTI)
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(out), bits)

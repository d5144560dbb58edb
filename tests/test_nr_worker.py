"""NR worker slot loop: gNB scheduling, UE blind decode, HARQ IR combining.

Reference behavior: srsue/src/phy/nr/cc_worker.cc + srsenb/src/phy/nr/
cc_worker.cc slot processing with srsue/src/stack/mac_nr/{dl,ul}_harq_nr.cc
HARQ entities (NDI-toggle new-TB detection, rv cycling 0,2,3,1).
"""

import jax.numpy as jnp
import numpy as np

from srslte_tpu.mac.harq_nr import NrDlHarqEntity, NrTxHarqEntity, RV_SEQ_NR
from srslte_tpu.nr_worker import GnbNrWorker, NrWorkerCommon, UeNrWorker
from srslte_tpu.phy.nr import Coreset, NrCarrier
from srslte_tpu.phy.nr.dlsch_nr import (NrDlschConfig, nr_dlsch_combine,
                                        nr_dlsch_decode, nr_dlsch_decode_state,
                                        nr_dlsch_encode)


def _llr(cfg, bits, rng, sigma):
    x = np.asarray(nr_dlsch_encode(jnp.asarray(bits, jnp.float32), cfg))
    y = (1.0 - 2.0 * x) + sigma * rng.standard_normal(cfg.G)
    return jnp.asarray(-2.0 * y / sigma**2, jnp.float32)


def test_harq_ir_combining_recovers_failed_first_tx():
    """The first transmission (rv 0) fails alone; IR-combining the rv-2
    retransmission into the softbuffer decodes (the point of
    dl_harq_nr.cc keeping the softbuffer).  The rv windows are disjoint
    here, so convergence needs the deeper iteration count."""
    rng = np.random.default_rng(5)
    cfg0 = NrDlschConfig(tbs=2152, G=3456, Qm=4, rate=0.64)
    cfg2 = NrDlschConfig(tbs=2152, G=3456, Qm=4, rate=0.64, rv=2)
    bits = rng.integers(0, 2, cfg0.tbs).astype(np.uint8)
    sigma = 1.15  # ~ -1.2 dB Es/N0: below the rv0-window threshold
    l0 = _llr(cfg0, bits, rng, sigma)
    l2 = _llr(cfg2, bits, rng, sigma)
    _, ok0 = nr_dlsch_decode(l0, cfg0)
    assert not bool(np.asarray(ok0))
    st = nr_dlsch_combine(l0, cfg0)
    st = nr_dlsch_combine(l2, cfg2, st)
    out, ok = nr_dlsch_decode_state(st, cfg0, n_iter=20)
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(out), bits)


def test_dl_harq_entity_ndi_toggle_and_duplicate_ack():
    """New TB on NDI toggle; a duplicate of a delivered TB is re-acked
    without decode (dl_harq_nr.cc:96)."""
    rng = np.random.default_rng(9)
    cfg = NrDlschConfig(tbs=2152, G=6912, Qm=4, rate=0.32)
    ent = NrDlHarqEntity()
    b1 = rng.integers(0, 2, cfg.tbs).astype(np.uint8)
    ack, out = ent.rx(3, 1, _llr(cfg, b1, rng, 0.5), cfg)
    assert ack and np.array_equal(out, b1)
    # duplicate (same NDI): acked again, no bits delivered twice
    ack, out = ent.rx(3, 1, _llr(cfg, b1, rng, 0.5), cfg)
    assert ack and out is None
    # NDI toggles: new TB on the same pid
    b2 = rng.integers(0, 2, cfg.tbs).astype(np.uint8)
    ack, out = ent.rx(3, 0, _llr(cfg, b2, rng, 0.5), cfg)
    assert ack and np.array_equal(out, b2)


def test_tx_harq_rv_cycling_and_drop():
    ent = NrTxHarqEntity(max_retx=2)
    pid = ent.free_pid()
    ndi, rv = ent.new_tx(pid, np.zeros(8, np.uint8))
    assert rv == RV_SEQ_NR[0]
    seen = [rv]
    while True:
        nr = ent.retx(pid)
        if nr is None:
            break
        assert nr[0] == ndi  # retransmissions keep the NDI
        seen.append(nr[1])
    assert seen == [0, 2, 3]  # initial + max_retx=2, then dropped
    assert not ent.procs[pid].active


def test_nr_worker_slot_loop_with_retx():
    """3 TBs through an AWGN channel hard enough that first transmissions
    fail: the loop must deliver all of them via HARQ retransmissions."""
    car = NrCarrier(n_prb=52, n_id=33)
    cs = Coreset.full(48, duration=1, id=1)
    common = NrWorkerCommon(carrier=car, coreset=cs, mcs=20)
    gnb = GnbNrWorker(common)
    ue = UeNrWorker(common)
    tbs = common.phy_grant(0).tbs
    rng = np.random.default_rng(77)
    payloads = [rng.integers(0, 2, tbs).astype(np.uint8) for _ in range(3)]
    for p in payloads:
        gnb.tx_data(p)
    # 64QAM mcs20 (rate ~0.55) needs ~ >13 dB; run at 10.5 dB so rv=0
    # alone fails and the rv cycle + IR combining must do the work
    sigma = 10 ** (-10.5 / 20) / np.sqrt(2)
    slots = 0
    while (gnb.queue or gnb._nacked or gnb._awaiting) and slots < 24:
        slot = slots % 2
        grid = gnb.tx_slot(slot)
        slots += 1
        if grid is None:
            continue
        g = np.asarray(grid)
        noisy = g + sigma * (rng.standard_normal(g.shape)
                             + 1j * rng.standard_normal(g.shape))
        ul = ue.rx_slot(jnp.asarray(noisy.astype(np.complex64)), slot)
        assert ul is not None  # PDCCH at agg 4 must survive this SNR
        u = np.asarray(ul)
        u = u + sigma * (rng.standard_normal(u.shape)
                         + 1j * rng.standard_normal(u.shape))
        gnb.rx_ul_slot(jnp.asarray(u.astype(np.complex64)), slot)
    assert gnb.dropped == 0
    assert len(ue.delivered) == 3
    got = {bytes(np.packbits(d)) for d in ue.delivered}
    want = {bytes(np.packbits(p)) for p in payloads}
    assert got == want
    assert slots > 3  # at least one retransmission happened
    assert sum(p.n_retx for p in ue.harq.procs) > 0

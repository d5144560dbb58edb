"""MAC layer tests: PDU codec, RAR, HARQ soft combining, scheduler.

Analogs: lib/test/mac (pdu pack/parse), srsue dl_harq behavior, and the
srsenb/test/mac scheduler invariant suite (sched_common_test_suite.cc).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.mac import DL_LCID, UL_LCID, MacPdu, Rar, RarPdu
from srslte_tpu.mac.harq import (DlHarqEntity, RV_SEQ, UlHarqEntity,
                                 combine_llr, decode_state)
from srslte_tpu.mac.sched import SchedDl
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.phch.dlsch import DlschConfig, dlsch_encode


# ----------------------------------------------------------------- MAC PDU
def test_mac_pdu_single_sdu():
    pdu = MacPdu()
    pdu.add_sdu(3, b"hello world")
    raw = pdu.pack()
    back = MacPdu.parse(raw)
    assert len(back.subpdus) == 1
    assert back.subpdus[0].lcid == 3
    assert back.subpdus[0].payload == b"hello world"


def test_mac_pdu_multi_sdu_and_ce():
    pdu = MacPdu()
    pdu.add_ce(DL_LCID.TA_CMD, bytes([31]))
    pdu.add_sdu(1, bytes(range(200)))  # >128: 15-bit length field
    pdu.add_sdu(2, b"abc")
    raw = pdu.pack()
    back = MacPdu.parse(raw)
    lcids = [s.lcid for s in back.subpdus]
    assert lcids == [DL_LCID.TA_CMD, 1, 2]
    assert back.subpdus[1].payload == bytes(range(200))
    assert back.subpdus[2].payload == b"abc"


@pytest.mark.parametrize("pad", [0, 1, 2, 17])
def test_mac_pdu_padding(pad):
    pdu = MacPdu()
    pdu.add_sdu(4, b"x" * 40)
    base = len(pdu.pack())
    raw = pdu.pack(pdu_len=base + pad)
    assert len(raw) == base + pad or pad == 0
    back = MacPdu.parse(raw)
    sdus = [s for s in back.subpdus if s.is_sdu]
    assert sdus[0].payload == b"x" * 40


def test_rar_pdu_roundtrip():
    pdu = RarPdu(backoff=5, rars=[Rar(rapid=17, ta=101, grant=0xABCDE,
                                      temp_crnti=0x4567)])
    back = RarPdu.parse(pdu.pack())
    assert back.backoff == 5
    r = back.rars[0]
    assert (r.rapid, r.ta, r.grant, r.temp_crnti) == (17, 101, 0xABCDE, 0x4567)


# ----------------------------------------------------------------- HARQ
def _tx_llr(bits, cfg, seed, noise=0.79):
    """Encode and produce noisy LLRs at ~2 dB Es/N0 per coded bit."""
    rng = np.random.default_rng(seed)
    coded = np.asarray(dlsch_encode(jnp.asarray(bits[None]), cfg))[0]
    llr = (2.0 * coded - 1.0)
    llr = llr + rng.standard_normal(len(llr)).astype(np.float32) * noise
    return jnp.asarray(llr[None].astype(np.float32))


def test_harq_ir_combining_recovers():
    """Single tx at rate 0.88 fails at 2 dB; rv=2 IR retx (rate 0.44) passes."""
    from dataclasses import replace

    rng = np.random.default_rng(0)
    cfg0 = DlschConfig(tbs=1384, G=1600, Qm=2, rv=0)  # heavily punctured
    bits = rng.integers(0, 2, cfg0.tbs).astype(np.uint8)
    harq = DlHarqEntity()

    ack1, out1 = harq.rx(0, ndi=1, llr=_tx_llr(bits, cfg0, 1), cfg=cfg0)
    assert not ack1
    cfg2 = replace(cfg0, rv=2)
    ack2, out2 = harq.rx(0, ndi=1, llr=_tx_llr(bits, cfg2, 2), cfg=cfg2)
    assert ack2
    np.testing.assert_array_equal(out2[0], bits)
    # new TB with toggled NDI resets the buffer
    bits3 = rng.integers(0, 2, cfg0.tbs).astype(np.uint8)
    ack3, _ = harq.rx(0, ndi=0, llr=_tx_llr(bits3, cfg0, 3), cfg=cfg0)
    assert not ack3  # fresh buffer, single punctured tx fails again


def test_ul_harq_rv_cycle():
    h = UlHarqEntity(max_retx=4)
    bits = np.ones(100, np.uint8)
    ndi, rv = h.new_tx(2, bits)
    assert rv == 0
    rvs = []
    while (r := h.retx(2)) is not None:
        rvs.append(r[0])
    assert rvs == [RV_SEQ[1], RV_SEQ[2], RV_SEQ[3]]


# ----------------------------------------------------------------- scheduler
@pytest.mark.parametrize("policy", ["rr", "pf"])
def test_sched_invariants_and_fairness(policy):
    cell = Cell(n_prb=25, id=1)
    s = SchedDl(cell, policy=policy, cfi=2)
    for i in range(4):
        s.add_ue(0x46 + i, cqi=10 + i)
    served = {0x46 + i: 0 for i in range(4)}
    for tti in range(40):
        for r in served:
            s.buffer_state(r, 5000)
        allocs = s.schedule(tti)
        assert allocs
        s.check_invariants(allocs)
        for a in allocs:
            served[a.rnti] += a.tbs
    assert all(v > 0 for v in served.values()), served


def test_sched_respects_empty_buffers():
    cell = Cell(n_prb=15, id=2)
    s = SchedDl(cell)
    s.add_ue(0x100)
    assert s.schedule(0) == []
    s.buffer_state(0x100, 10)
    allocs = s.schedule(1)
    assert len(allocs) == 1
    assert allocs[0].tbs >= 80  # covers the 10 bytes


def test_sched_to_phy_integration():
    """Scheduler grants -> PDCCH+PDSCH encode -> each UE blind-decodes its own."""
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.phch.dci import format1_size, pack_format1, unpack_format1
    from srslte_tpu.phy.phch.pdcch import Pdcch
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.ue.ue_dl import UeDl

    cell = Cell(n_prb=15, id=7)
    cfi = 2
    s = SchedDl(cell, cfi=cfi)
    rntis = [0x41, 0x42]
    for r in rntis:
        s.add_ue(r, cqi=9)
        s.buffer_state(r, 100)
    tti = 4
    allocs = s.schedule(tti)
    assert len(allocs) == 2
    s.check_invariants(allocs)

    enb, ue = EnbDl(cell), UeDl(cell)
    rng = np.random.default_rng(3)
    payloads = {}
    g = enb.put_base(enb.empty_grids(), tti % 10)
    g = enb.put_pcfich(g, tti % 10, cfi)
    for a in allocs:
        g = enb.put_pdcch(g, tti % 10, cfi, pack_format1(a.dci, cell.n_prb),
                          a.rnti, a.loc)
        pdsch = Pdsch(cell, a.grant, tti % 10, cfi=cfi, rnti=a.rnti)
        bits = rng.integers(0, 2, a.grant.tbs).astype(np.uint8)
        payloads[a.rnti] = bits
        g = enb.put_pdsch(g, pdsch, jnp.asarray(bits))
    samples = enb.gen_signal(g)[..., 0, :]

    grid, ce, info = ue.fft_estimate(samples, tti % 10)
    for a in allocs:
        hits = Pdcch(cell, cfi, tti % 10).search(grid, ce, a.rnti,
                                                 format1_size(cell.n_prb))
        assert hits, a.rnti
        dci = unpack_format1(hits[0][1], cell.n_prb)
        assert dci == a.dci
        pdsch = Pdsch(cell, dci.grant(cell.n_prb), tti % 10, cfi=cfi,
                      rnti=a.rnti)
        out, ok = pdsch.decode(grid, ce, info["noise"])
        assert bool(np.asarray(ok))
        np.testing.assert_array_equal(np.asarray(out), payloads[a.rnti])


def test_ul_scheduler_bsr_driven():
    from srslte_tpu.mac.sched import SchedUl

    cell = Cell(n_prb=25, id=3)
    s = SchedUl(cell, cfi=2)
    s.ul_bsr(0x50, 100)
    s.ul_bsr(0x51, 40)
    s.mcs[0x50] = 12
    allocs = s.schedule(4)
    assert len(allocs) == 2
    s.check_invariants(allocs)
    # grants cover the reported buffers
    for a in allocs:
        assert a.tbs >= 0
    assert s.bsr[0x50] < 100 and s.bsr[0x51] < 40
    # empty BSR -> nothing scheduled
    s.bsr = {0x50: 0}
    assert s.schedule(5) == []


def test_bsr_phr_ces():
    from srslte_tpu.mac.proc import (BsrProc, SrProc, bsr_index, long_bsr_ce,
                                     parse_long_bsr, parse_phr, phr_ce,
                                     short_bsr_ce)

    assert bsr_index(0) == 0
    assert bsr_index(1) == 1
    assert bsr_index(150) == 19  # 146 <= 150 < 171
    assert bsr_index(10**6) == 63
    ce = short_bsr_ce(2, 150)
    assert ce[0] >> 6 == 2 and (ce[0] & 0x3F) == 19
    lb = long_bsr_ce([0, 150, 2000, 10**6])
    assert parse_long_bsr(lb) == [0, 19, bsr_index(2000), 63]
    assert parse_phr(phr_ce(10.0)) == 10.0
    assert parse_phr(phr_ce(-40)) == -23.0  # clamped

    b = BsrProc(periodic_timer=4)
    b.buffer_state_changed(500)
    assert b.generate({0: 500}) is not None
    assert b.generate({0: 500}) is None  # one-shot until re-triggered
    for _ in range(4):
        b.tick()
    assert b.generate({0: 500}) is not None  # periodic re-trigger

    sr = SrProc(max_sr=2)
    sr.trigger()
    assert sr.sr_opportunity() and sr.sr_opportunity()
    assert not sr.sr_opportunity() and sr.failed

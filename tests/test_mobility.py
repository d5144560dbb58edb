"""Mobility e2e: measurement-driven handover and RLF -> reestablishment.

Reference behaviors being matched over the air (VERDICT item 5):
- srsenb/src/stack/rrc/rrc_mobility.cc — A3 MeasurementReport ->
  RRCConnectionReconfiguration with mobilityControlInfo -> contention-free
  RACH on the target -> ReconfigurationComplete, with DRB data held during
  the handover and resumed on the target cell.
- srsue/src/phy/sync.cc:664-688 + srsue rrc.cc — N310 consecutive
  out-of-sync starts T310; expiry declares RLF; the UE selects the
  strongest measured cell and sends RRCConnectionReestablishmentRequest
  (C-RNTI, PCI, ShortMAC-I); the eNB validates ShortMAC-I and re-anchors
  the context with PDCP/RLC continuity.

Two cells of one EnbApp (PCIs 42/45: CRS v-shifts 0/3, non-colliding)
share the air; the UE sees a gain-weighted sum.  Every control bit crosses
as real OFDM samples: PRACH, RAR, PDCCH/PDSCH, PUCCH SRs, PUSCH.
"""

import numpy as np
import pytest

from srslte_tpu.enb import EnbApp
from srslte_tpu.epc import Hss, Mme, Spgw
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.security.milenage import compute_opc
from srslte_tpu.ue import UeApp
from srslte_tpu.ue_stack import SoftUsim, UeNas

IMSI = "001010123456789"
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")
PCI_A, PCI_B = 42, 45


def _make():
    cells = [Cell(n_prb=15, id=PCI_A, nof_ports=1),
             Cell(n_prb=15, id=PCI_B, nof_ports=1)]
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cells, mme=mme)
    ue = UeApp(cells[0], UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))),
               neighbor_pcis=(PCI_B,))
    return enb, ue


def _step(enb, ue, tti, ga, gb, sigma=0.0, rng=None):
    """One TTI of two-cell virtual RF: DL sum with per-cell gains, UL routed
    to the UE's serving cell."""
    dl = (ga * np.asarray(enb.tx_subframe(tti, pci=PCI_A))
          + gb * np.asarray(enb.tx_subframe(tti, pci=PCI_B)))
    if sigma > 0.0:
        dl = dl + sigma * (rng.standard_normal(dl.shape)
                           + 1j * rng.standard_normal(dl.shape)
                           ).astype(np.complex64) / np.sqrt(2)
    ue.rx_subframe(dl.astype(np.complex64), tti)
    ul = ue.tx_subframe(tti)
    serving = ue.cell.id
    for pci in (PCI_A, PCI_B):
        enb.rx_subframe(ul if (ul is not None and pci == serving) else None,
                        tti, pci=pci)


def _attach(enb, ue, *, sigma=0.0, rng=None, gb=0.05):
    tti = 0
    while tti < 300 and ue.nas.state != "attached":
        _step(enb, ue, tti, 1.0, gb, sigma, rng)
        tti += 1
    # settle until the DRB reconfiguration completes
    for _ in range(30):
        _step(enb, ue, tti, 1.0, gb, sigma, rng)
        tti += 1
    assert ue.nas.state == "attached", f"attach failed: {ue.nas.state}"
    assert ue.cell.id == PCI_A
    return tti


@pytest.mark.slow
def test_a3_handover_with_data_continuity():
    enb, ue = _make()
    tti = _attach(enb, ue)

    # pre-handover traffic proves the DRB
    ue.send_data(b"ping-on-A")
    enb.send_data(ue.crnti, b"pong-on-A")
    for _ in range(60):
        _step(enb, ue, tti, 1.0, 0.05)
        tti += 1
        if ue.rx_data and enb.ues[ue.crnti].rx_data:
            break
    assert enb.ues[ue.crnti].rx_data == [b"ping-on-A"]
    assert ue.rx_data == [b"pong-on-A"]
    assert ue.meas_engine is not None, "measConfig never applied"
    old_crnti = ue.crnti

    # neighbor B comes up 8 dB above serving A -> A3 -> handover
    deadline = tti + 150
    while tti < deadline and ue.ho_count == 0:
        _step(enb, ue, tti, 0.4, 1.0)
        tti += 1
    for _ in range(20):  # let ReconfigurationComplete land on the target
        _step(enb, ue, tti, 0.4, 1.0)
        tti += 1
    assert ue.ho_count == 1, "handover never executed"
    assert ue.cell.id == PCI_B
    assert ue.crnti != old_crnti
    ectx = enb.ues[ue.crnti]
    assert ectx.pci == PCI_B and not ectx.ho_pending
    assert old_crnti not in enb.ues, "stale source C-RNTI context"

    # post-handover traffic on the target cell, same PDCP entities
    ue.send_data(b"ping-on-B")
    enb.send_data(ue.crnti, b"pong-on-B")
    for _ in range(80):
        _step(enb, ue, tti, 0.05, 1.0)
        tti += 1
        if len(ue.rx_data) > 1 and len(ectx.rx_data) > 1:
            break
    assert ectx.rx_data == [b"ping-on-A", b"ping-on-B"]
    assert ue.rx_data == [b"pong-on-A", b"pong-on-B"]


@pytest.mark.slow
def test_rlf_reestablishment_on_neighbor_cell():
    rng = np.random.default_rng(7)
    sigma = 0.05  # AWGN floor so a collapsed serving cell really reads <-3dB
    enb, ue = _make()
    tti = _attach(enb, ue, sigma=sigma, rng=rng)
    old_crnti = ue.crnti

    # serving cell A collapses 34 dB below the noise-floor-adjacent level;
    # B is strong: N310 out-of-sync -> T310 -> RLF -> reestablish on B
    deadline = tti + 250
    while tti < deadline and ue.reest_count == 0:
        _step(enb, ue, tti, 0.02, 1.0, sigma, rng)
        tti += 1
    for _ in range(40):  # drain complete + DRB re-add reconfiguration
        _step(enb, ue, tti, 0.02, 1.0, sigma, rng)
        tti += 1
    assert ue.rlm.rlf or ue.reest_count, "RLF never declared"
    assert ue.reest_count == 1, "reestablishment never completed"
    assert ue.cell.id == PCI_B
    assert ue.crnti != old_crnti
    ectx = enb.ues[ue.crnti]
    assert ectx.pci == PCI_B

    # user plane resumes with the surviving PDCP/RLC state
    ue.send_data(b"back-from-the-dead")
    enb.send_data(ue.crnti, b"welcome-back")
    for _ in range(80):
        _step(enb, ue, tti, 0.02, 1.0, sigma, rng)
        tti += 1
        if ue.rx_data and ectx.rx_data:
            break
    assert ectx.rx_data == [b"back-from-the-dead"]
    assert ue.rx_data == [b"welcome-back"]


def test_short_mac_i_rejects_wrong_key():
    """ShortMAC-I validation gate (36.331 5.3.7.4): a context with a
    different integrity key must be rejected."""
    from srslte_tpu.rrc.mobility import short_mac_i
    from srslte_tpu.security import EIA2

    k1, k2 = bytes(range(16)), bytes(range(1, 17))
    a = short_mac_i(k1, EIA2, cell_id=0x0019B01, pci=42, c_rnti=0x46)
    b = short_mac_i(k2, EIA2, cell_id=0x0019B01, pci=42, c_rnti=0x46)
    assert a != b
    assert 0 <= a < 1 << 16


def test_radio_link_monitor_state_machine():
    """N310/T310/N311 semantics (sync.cc:664-688)."""
    from srslte_tpu.rrc.mobility import RadioLinkMonitor, RlmConfig

    rlm = RadioLinkMonitor(RlmConfig(n310=3, n311=2, t310_ms=5))
    # below out-of-sync threshold: T310 arms after 3 strikes
    for _ in range(3):
        assert not rlm.step(-10.0)
    assert rlm.t310 > 0
    # recovery: 2 in-sync stops T310
    assert not rlm.step(5.0)
    assert not rlm.step(5.0)
    assert rlm.t310 < 0 and not rlm.rlf
    # collapse again and let T310 expire -> RLF exactly once
    for _ in range(3):
        rlm.step(-10.0)
    fired = [rlm.step(-10.0) for _ in range(10)]
    assert fired.count(True) == 1
    assert rlm.rlf

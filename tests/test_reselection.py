"""Idle-mode cell reselection (36.304) over the air.

A released UE camped on cell A keeps measuring; when cell B out-ranks A by
Qhyst for Treselection, the camp moves to B (rrc_cell.cc / 36.304
R-criterion analog).  A subsequent page — broadcast on every cell of the
eNB, like the reference's tracking-area paging — reaches the UE on B and
it reconnects there.
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


def _step(enb, ue, tti, ga, gb):
    dl = (ga * np.asarray(enb.tx_subframe(tti, pci=PCI_A))
          + gb * np.asarray(enb.tx_subframe(tti, pci=PCI_B)))
    ue.rx_subframe(dl.astype(np.complex64), tti)
    ul = ue.tx_subframe(tti)
    serving = ue.cell.id
    for pci in (PCI_A, PCI_B):
        enb.rx_subframe(ul if (ul is not None and pci == serving) else None,
                        tti, pci=pci)


@pytest.mark.slow
def test_idle_reselection_then_page_on_new_cell():
    cells = [Cell(n_prb=15, id=PCI_A, nof_ports=1),
             Cell(n_prb=15, id=PCI_B, nof_ports=1)]
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cells, mme=mme)
    ue = UeApp(cells[0], UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))),
               neighbor_pcis=(PCI_B,))

    # attach on A (strong), B faint
    tti = 0
    while tti < 300 and ue.nas.state != "attached":
        _step(enb, ue, tti, 1.0, 0.05)
        tti += 1
    assert ue.nas.state == "attached"
    crnti = ue.crnti

    # release to idle
    enb.release_connection(enb.ues[crnti])
    while tti < 500 and ue.state != "camped":
        _step(enb, ue, tti, 1.0, 0.05)
        tti += 1
    assert ue.state == "camped" and ue.rrc_state == "idle"
    assert ue.cell.id == PCI_A

    # power flips: B now dominates by >> Qhyst; reselection after Tresel
    t0 = tti
    while tti < t0 + 300 and ue.reselect_count == 0:
        _step(enb, ue, tti, 0.05, 1.0)
        tti += 1
    assert ue.reselect_count == 1, "UE never reselected to the stronger cell"
    assert ue.cell.id == PCI_B
    assert ue.state == "camped"

    # page -> reconnect on cell B
    enb.page(ue.nas.guti)
    t0 = tti
    while tti < t0 + 400 and ue.state != "connected":
        _step(enb, ue, tti, 0.05, 1.0)
        tti += 1
    assert ue.paged >= 1, "page never reached the reselected UE"
    assert ue.state == "connected"
    assert ue.cell.id == PCI_B
    # the new connection anchors on cell B's carrier at the eNB
    assert enb.ues[ue.crnti].pci == PCI_B

"""Two UEs served concurrently by one eNB over the air.

Both UEs attach (staggered so their PRACH occasions don't superpose on the
fixed msg3 grant), then exchange user-plane data in the same TTIs: the
scheduler shares RBGs/CCEs between the C-RNTIs, UL samples superpose on
the air (distinct PUSCH PRBs; PUCCH format-1 resources are
cyclic-shift-orthogonal in the same PRB pair), and HARQ feedback flows per
UE.  srsenb serves multiple UEs the same way (sched_grid.cc multi-UE
allocation; srsue/test multi-UE scenarios are simulation-level only —
this test is over real PHY samples).
"""

import numpy as np
import pytest

from srslte_tpu.enb import EnbApp
from srslte_tpu.epc import Hss, Mme, Spgw
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.security.milenage import compute_opc
from srslte_tpu.ue import UeApp
from srslte_tpu.ue_stack import SoftUsim, UeNas

K1 = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
K2 = bytes.fromhex("fec86ba6eb707ed08905757b1bb44b8f")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")


@pytest.mark.slow
def test_two_ues_attach_and_data_over_the_air():
    cell = Cell(n_prb=15, id=42, nof_ports=1)
    hss = Hss()
    hss.add_subscriber("001010123456789", K1, op=OP)
    hss.add_subscriber("001010000000001", K2, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cell, mme=mme)
    ue1 = UeApp(cell, UeNas(SoftUsim("001010123456789", K1,
                                     compute_opc(K1, OP))))
    ue2 = UeApp(cell, UeNas(SoftUsim("001010000000001", K2,
                                     compute_opc(K2, OP))))
    UE2_START = 80  # stagger so the PRACH/msg3 occasions never superpose

    sent = {1: False, 2: False}
    for tti in range(500):
        dl = enb.tx_subframe(tti)
        ue1.rx_subframe(dl, tti)
        if tti >= UE2_START:
            ue2.rx_subframe(dl, tti)
        ul1 = ue1.tx_subframe(tti)
        ul2 = ue2.tx_subframe(tti) if tti >= UE2_START else None
        if ul1 is not None and ul2 is not None:
            ul = ul1 + ul2  # superposition on the air
        else:
            ul = ul1 if ul1 is not None else ul2
        enb.rx_subframe(ul, tti)
        for i, ue in ((1, ue1), (2, ue2)):
            if (ue.nas.state == "attached" and ue.pdcp_drb is not None
                    and not sent[i]):
                ue.send_data(f"ul-ping-{i}".encode())
                enb.send_data(ue.crnti, f"dl-pong-{i}".encode())
                sent[i] = True
        if (sent[1] and sent[2] and ue1.rx_data and ue2.rx_data
                and enb.ues[ue1.crnti].rx_data and enb.ues[ue2.crnti].rx_data):
            break

    assert ue1.nas.state == "attached", f"UE1 NAS: {ue1.nas.state}"
    assert ue2.nas.state == "attached", f"UE2 NAS: {ue2.nas.state}"
    assert ue1.crnti != ue2.crnti
    # user plane delivered per UE, both directions, no cross-delivery
    assert enb.ues[ue1.crnti].rx_data == [b"ul-ping-1"]
    assert enb.ues[ue2.crnti].rx_data == [b"ul-ping-2"]
    assert ue1.rx_data == [b"dl-pong-1"]
    assert ue2.rx_data == [b"dl-pong-2"]

"""Over-the-air attach with the EPC behind real wire protocols.

The eNB talks to the MME over an S1AP association (SCTP, or TCP-framed
fallback carrying identical S1AP bytes), the MME drives the SPGW over
GTP-C/UDP (S11), and user-plane data crosses S1-U as GTP-U/UDP G-PDUs —
the reference's srsenb <-> srsepc topology (s1ap.cc:33, mme_gtpc.cc,
spgw/gtpu.cc:105) with the LTE radio in between.
"""

import numpy as np
import pytest

from srslte_tpu.enb import EnbApp
from srslte_tpu.epc import Hss
from srslte_tpu.epc.wire import EpcApp
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.security.milenage import compute_opc
from srslte_tpu.ue import UeApp
from srslte_tpu.ue_stack import SoftUsim, UeNas

IMSI = "001010123456789"
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")


@pytest.mark.slow
def test_attach_and_data_over_s1_wire():
    sgi_rx = []
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    epc = EpcApp(hss, force_tcp=True,
                 sgi_tx=lambda ip, pkt: sgi_rx.append((ip, pkt)))
    try:
        cell = Cell(n_prb=15, id=1, nof_ports=1)
        enb = EnbApp(cell, s1={"port": epc.s1_port, "force_tcp": True})
        ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))

        def step(tti):
            ue.rx_subframe(np.asarray(enb.tx_subframe(tti)), tti)
            enb.rx_subframe(ue.tx_subframe(tti), tti)
            epc.step()

        tti = 0
        while tti < 400 and ue.nas.state != "attached":
            step(tti)
            tti += 1
        assert ue.nas.state == "attached", f"attach failed: {ue.nas.state}"
        assert enb.s1.setup_done, "S1Setup never completed"
        ectx = enb.ues[ue.crnti]
        assert ectx.teid_ul, "no S1-U uplink TEID from the ICS"
        assert ectx.kenb, "KeNB not carried by InitialContextSetup"
        # settle the DRB reconfiguration
        for _ in range(30):
            step(tti)
            tti += 1

        # UL: UE -> DRB -> eNB -> GTP-U -> SPGW -> SGi
        ue.send_data(b"uplink-over-gtpu")
        for _ in range(80):
            step(tti)
            tti += 1
            if sgi_rx:
                break
        assert sgi_rx and sgi_rx[0][1] == b"uplink-over-gtpu"
        ue_ip = sgi_rx[0][0]
        assert ue_ip == ue.nas.ip, "SPGW session IP mismatch"

        # DL: SGi -> SPGW -> GTP-U -> eNB -> DRB -> UE
        assert epc.spgw.send_dl(ue_ip, b"downlink-over-gtpu")
        for _ in range(80):
            step(tti)
            tti += 1
            if ue.rx_data:
                break
        assert ue.rx_data == [b"downlink-over-gtpu"]
    finally:
        epc.close()


def test_gtpc_codec_roundtrip():
    from srslte_tpu.epc import gtpc

    pdu = gtpc.GtpcPdu(gtpc.CREATE_SESSION_RESPONSE, teid=7, sequence=3,
                       imsi=1010123456789, mme_ctrl_teid=3,
                       user_fteid=gtpc.Fteid(0x1234, "127.0.0.1", 40002),
                       paa="172.16.0.2")
    out = gtpc.GtpcPdu.unpack(pdu.pack())
    assert out == pdu
    bare = gtpc.GtpcPdu(gtpc.DELETE_SESSION_REQUEST, teid=9)
    assert gtpc.GtpcPdu.unpack(bare.pack()) == bare

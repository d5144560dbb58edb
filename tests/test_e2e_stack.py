"""Flagship end-to-end stack test (test/run_lte.sh analog, SURVEY.md §4.7):

eNB app + UE app exchange REAL PHY subframes TTI by TTI (virtual RF):
MIB -> PRACH/RAR/msg3/msg4 contention resolution -> RRC connection ->
NAS attach with Milenage AKA + NAS security -> RRC security (AS keys) ->
DRB setup -> ciphered user-plane traffic both directions through
PDCP/RLC/MAC/PHY. Every control bit crosses the air interface as OFDM/
SC-FDMA samples.
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


@pytest.mark.slow
def test_full_stack_attach_and_data_over_the_air():
    cell = Cell(n_prb=15, id=42, nof_ports=1)
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cell, mme=mme)
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))

    data_sent = False
    for tti in range(160):
        dl = enb.tx_subframe(tti)
        ue.rx_subframe(dl, tti)
        ul = ue.tx_subframe(tti)
        enb.rx_subframe(ul, tti)
        if (ue.nas.state == "attached" and ue.pdcp_drb is not None
                and not data_sent):
            ue.send_data(b"uplink-ping")
            enb.send_data(ue.crnti, b"downlink-pong")
            data_sent = True
        if data_sent and ue.rx_data and enb.ues[ue.crnti].rx_data:
            break

    assert ue.mib is not None, "MIB never decoded"
    assert ue.state == "connected", f"RA failed: {ue.ra.state}"
    assert ue.nas.state == "attached", f"NAS state: {ue.nas.state}"
    assert ue.nas.ip.startswith("172.16.0.")
    assert ue.sib1 is not None, "SIB1 never received"
    # NAS keys agree end to end
    ectx = mme.ues[enb.ues[ue.crnti].ue_id]
    assert ue.nas.sec.k_int == ectx.sec.k_int
    # user plane delivered, ciphered, both directions
    assert enb.ues[ue.crnti].rx_data == [b"uplink-ping"]
    assert ue.rx_data == [b"downlink-pong"]


@pytest.mark.slow
def test_release_page_and_reconnect_over_the_air():
    """Connected UE is released (RRCConnectionRelease), camps on paging,
    the network pages its GUTI on P-RNTI, and the UE re-establishes the
    connection — PCCH paging delivery end to end."""
    cell = Cell(n_prb=15, id=42, nof_ports=1)
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cell, mme=mme)
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))

    released = paged = False
    for tti in range(400):
        dl = enb.tx_subframe(tti)
        ue.rx_subframe(dl, tti)
        ul = ue.tx_subframe(tti)
        enb.rx_subframe(ul, tti)
        if ue.nas.state == "attached" and not released and ue.crnti:
            ctx = enb.ues.get(ue.crnti)
            if ctx is not None and ctx.rrc_state in ("secure",
                                                     "rrc_reconfigured"):
                enb.release_connection(ctx)
                released = True
                old_crnti = ue.crnti
        if released and ue.state == "camped" and not paged:
            enb.release_ue(enb.ues[old_crnti])
            enb.page(ue.nas.guti)
            paged = True
        if paged and ue.paged and ue.state == "connected":
            break

    assert released, "release never sent"
    assert ue.paged >= 1, "paging never received"
    assert ue.state == "connected", f"no reconnect: {ue.state}/{ue.ra.state}"
    assert ue.crnti and ue.crnti in enb.ues

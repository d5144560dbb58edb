"""HARQ-ACK feedback over PUCCH in the full-stack loop.

The UE answers every DL assignment with ACK/NACK on PUCCH format 1a at
n_pucch = N_PUCCH_1 + n_cce (pucch_proc resource derivation); the eNB
decodes the expected resource, treats low correlation as DTX, and
retransmits NACKed TBs through the scheduler (reference:
srsue/src/stack/mac/dl_harq.cc ack path + srsenb sched HARQ).
"""

import numpy as np
import pytest

from srslte_tpu.enb import EnbApp
from srslte_tpu.epc import Hss, Mme, Spgw
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.phch.pdsch import Pdsch
from srslte_tpu.security.milenage import compute_opc
from srslte_tpu.ue import UeApp
from srslte_tpu.ue_stack import SoftUsim, UeNas

IMSI = "001010123456789"
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")


@pytest.mark.slow
def test_nack_triggers_pucch_and_retransmission(monkeypatch):
    cell = Cell(n_prb=15, id=42, nof_ports=1)
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cell, mme=mme)
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))
    cc = enb.ccs[cell.id]

    real_decode = Pdsch.decode
    corrupt = {"on": False}

    def flaky_decode(self, grid, ce, noise, **kw):
        bits, ok = real_decode(self, grid, ce, noise, **kw)
        if corrupt["on"]:
            import jax.numpy as jnp

            return bits, jnp.asarray(False)  # force a TB CRC failure
        return bits, ok

    monkeypatch.setattr(Pdsch, "decode", flaky_decode)

    data_sent = nacked = retxed = False
    acked_ttis = []
    for tti in range(300):
        dl = enb.tx_subframe(tti)
        ue.rx_subframe(dl, tti)
        if ue.pending_ack.get(tti + 4, (None, None))[1] == 0:
            nacked = True
        ul = ue.tx_subframe(tti)
        enb.rx_subframe(ul, tti)
        if cc.dl_retx:
            retxed = True
        if (ue.nas.state == "attached" and ue.pdcp_drb is not None
                and not data_sent):
            # corrupt exactly the next DL data TB the UE receives
            corrupt["on"] = True
            enb.send_data(ue.crnti, b"harq-payload")
            data_sent = True
        if nacked and corrupt["on"]:
            corrupt["on"] = False  # one NACK is enough; let the retx decode
        if data_sent and ue.rx_data:
            break

    assert ue.nas.state == "attached"
    assert nacked, "forced CRC failure never produced a NACK"
    assert retxed, "eNB never queued a retransmission for the NACK"
    assert ue.rx_data == [b"harq-payload"], "retransmission not delivered"


@pytest.mark.slow
def test_clean_channel_acks_no_spurious_retx():
    """On a clean channel every TB ACKs and dl_retx stays empty."""
    cell = Cell(n_prb=15, id=42, nof_ports=1)
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cell, mme=mme)
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))
    cc = enb.ccs[cell.id]

    data_sent = False
    saw_ack_tx = False
    retx_events = 0
    for tti in range(200):
        dl = enb.tx_subframe(tti)
        ue.rx_subframe(dl, tti)
        if ue.pending_ack:
            saw_ack_tx = True
        ul = ue.tx_subframe(tti)
        enb.rx_subframe(ul, tti)
        retx_events += len(cc.dl_retx)
        if (ue.nas.state == "attached" and ue.pdcp_drb is not None
                and not data_sent):
            enb.send_data(ue.crnti, b"pong")
            data_sent = True
        if data_sent and ue.rx_data:
            break

    assert ue.rx_data == [b"pong"]
    assert saw_ack_tx, "UE never armed HARQ feedback"
    assert retx_events == 0, "clean channel must not retransmit"

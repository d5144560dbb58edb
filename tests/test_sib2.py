"""SIB2 is live config: the UE derives PRACH geometry and the PUCCH ACK
region from the broadcast, not from shared constants.

An eNB configured with NON-default SIB2 values serves a default-constructed
UE: attach only succeeds because the UE acquires SIB2 before RACH (36.331
SI acquisition) and builds its PRACH (root sequence, zero-correlation zone)
and N(1)_PUCCH from it — the reference's enb_cfg_parser sib2 -> phy path.
"""

import numpy as np
import pytest

from srslte_tpu.enb import EnbApp
from srslte_tpu.epc import Hss, Mme, Spgw
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.rrc.messages import Sib2, rrc_pack, rrc_unpack
from srslte_tpu.security.milenage import compute_opc
from srslte_tpu.ue import UeApp
from srslte_tpu.ue_stack import SoftUsim, UeNas

IMSI = "001010123456789"
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")


def test_sib2_per_roundtrip():
    s = Sib2(root_seq_idx=648, prach_cfg_idx=15, zero_corr_cfg=11,
             n1_pucch_an=36)
    assert rrc_unpack(rrc_pack(s), "bcch") == s


@pytest.mark.slow
def test_attach_with_nondefault_sib2():
    cell = Cell(n_prb=15, id=42, nof_ports=1)
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    sib2 = Sib2(root_seq_idx=6, zero_corr_cfg=5, n1_pucch_an=24)
    enb = EnbApp(cell, mme=mme, sib2=sib2)
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))

    data_sent = False
    for tti in range(260):
        dl = enb.tx_subframe(tti)
        ue.rx_subframe(dl, tti)
        ul = ue.tx_subframe(tti)
        enb.rx_subframe(ul, tti)
        if (ue.nas.state == "attached" and ue.pdcp_drb is not None
                and not data_sent):
            enb.send_data(ue.crnti, b"sib2-pong")
            data_sent = True
        if data_sent and ue.rx_data:
            break

    # the UE learned the non-default config over the air...
    assert ue.sib2 == sib2
    assert ue.n_pucch_1 == 24
    assert ue.prach_cfg.zero_corr_cfg == 5
    assert ue.prach_cfg.root_seq_idx == 6
    # ...and the whole attach + HARQ-acknowledged data ran on it
    assert ue.nas.state == "attached"
    assert ue.rx_data == [b"sib2-pong"]


@pytest.mark.slow
def test_prach_config_index_moves_the_opportunity():
    """prach-ConfigIndex 4 puts PRACH in subframe 4 (36.211 table 5.7.1-2)
    on BOTH ends — attach succeeds with no transmission at the default sf 1."""
    cell = Cell(n_prb=15, id=42, nof_ports=1)
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cell, mme=mme, sib2=Sib2(prach_cfg_idx=4))
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))
    assert enb._prach_sf() == 4

    prach_ttis = []
    for tti in range(260):
        dl = enb.tx_subframe(tti)
        ue.rx_subframe(dl, tti)
        pending = {t: v.kind for t, v in ue.pending_ul.items()}
        ul = ue.tx_subframe(tti)
        if pending.get(tti) == "prach":
            prach_ttis.append(tti)
        enb.rx_subframe(ul, tti)
        if ue.nas.state == "attached":
            break

    assert ue.nas.state == "attached"
    assert prach_ttis and all(t % 10 == 4 for t in prach_ttis), prach_ttis

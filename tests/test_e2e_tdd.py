"""TDD full-frame stack loop: attach + data over frame structure type 2.

The FDD flagship e2e (test_e2e_stack.py) re-run on a TDD cell: the eNB
transmits only DL and DwPTS subframes (type-2 PSS/SSS placement, GP/UpPTS
silenced), the UE transmits only in UL subframes, PRACH rides the first UL
subframe, and UL grants follow the 36.213 table 8-2 k_pusch delays.  The
reference supports TDD in the UE PHY (srsue cc_worker set_tdd_config,
phy_common.cc k_pusch); the eNB side here goes beyond the reference (srsenb
is FDD-only) so the loop can be driven end to end.
"""

import numpy as np
import pytest

from srslte_tpu.enb import EnbApp
from srslte_tpu.epc import Hss, Mme, Spgw
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.common.tdd import SfType, TddConfig
from srslte_tpu.security.milenage import compute_opc
from srslte_tpu.ue import UeApp
from srslte_tpu.ue_stack import SoftUsim, UeNas

IMSI = "001010123456789"
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")


def test_k_pusch_lands_on_ul_subframes():
    """Every non-zero table-8-2 entry points at an UL subframe."""
    for cfg in range(7):
        tdd = TddConfig(sf_config=cfg)
        for sf in range(10):
            k = tdd.k_pusch(sf)
            if k:
                assert tdd.sf_type(sf) is not SfType.UL
                assert tdd.sf_type((sf + k) % 10) is SfType.UL
        for sf in range(10):
            k = tdd.k_phich(sf)
            if k:
                assert tdd.sf_type(sf) is SfType.UL
                assert tdd.sf_type((sf + k) % 10) is not SfType.UL


@pytest.mark.slow
def test_tdd_full_stack_attach_and_data():
    cell = Cell(n_prb=15, id=42, nof_ports=1, frame_type="tdd")
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    mme = Mme(hss, Spgw())
    enb = EnbApp(cell, mme=mme)
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))
    tdd = enb.tdd
    assert tdd is not None and ue.tdd == tdd

    data_sent = False
    for tti in range(240):
        dl = enb.tx_subframe(tti)
        # frame discipline: DL signal exactly on D/S subframes
        assert (dl is not None) == (tdd.sf_type(tti % 10) is not SfType.UL)
        if dl is not None:
            ue.rx_subframe(dl, tti)
        else:
            ue.rx_subframe(None, tti)  # UE skips UL subframes internally
        ul = ue.tx_subframe(tti)
        if ul is not None:
            assert tdd.sf_type(tti % 10) is SfType.UL
            enb.rx_subframe(ul, tti)
        else:
            enb.rx_subframe(None, tti)
        if (ue.nas.state == "attached" and ue.pdcp_drb is not None
                and not data_sent):
            ue.send_data(b"tdd-uplink-ping")
            enb.send_data(ue.crnti, b"tdd-downlink-pong")
            data_sent = True
        if data_sent and ue.rx_data and enb.ues[ue.crnti].rx_data:
            break

    assert ue.mib is not None, "MIB never decoded"
    assert ue.state == "connected", f"RA failed: {ue.ra.state}"
    assert ue.nas.state == "attached", f"NAS state: {ue.nas.state}"
    assert enb.ues[ue.crnti].rx_data == [b"tdd-uplink-ping"]
    assert ue.rx_data == [b"tdd-downlink-pong"]

"""PDCP tests — analog of lib/test/upper/pdcp_lte_test_*.cc: ciphered +
integrity-protected SRB/DRB loopback, HFN carry, tamper detection, and the
full PDCP-over-RLC-AM stack."""

import numpy as np
import pytest

from srslte_tpu.pdcp import PdcpConfig, PdcpEntity
from srslte_tpu.security import EEA1, EEA2, EEA3, EIA1, EIA2, EIA3

K_ENC = bytes(range(16))
K_INT = bytes(range(16, 32))


def _pair(cfg):
    ue = PdcpEntity(cfg, K_ENC, K_INT, is_ue=True)
    enb = PdcpEntity(cfg, K_ENC, K_INT, is_ue=False)
    return ue, enb


@pytest.mark.parametrize("ea,ia", [(EEA1, EIA1), (EEA2, EIA2), (EEA3, EIA3)])
def test_srb_integrity_and_ciphering(ea, ia):
    cfg = PdcpConfig(is_srb=True, bearer_id=1, ea=ea, ia=ia)
    ue, enb = _pair(cfg)
    for i in range(5):
        msg = bytes([i]) * (10 + i)
        pdu = ue.tx(msg)
        assert msg not in pdu  # ciphered
        out = enb.rx(pdu)
        assert out == msg
    # and downlink
    pdu = enb.tx(b"rrc-dl")
    assert ue.rx(pdu) == b"rrc-dl"
    assert ue.integrity_failed == 0 and enb.integrity_failed == 0


def test_srb_tamper_detected():
    cfg = PdcpConfig(is_srb=True, bearer_id=1, ea=EEA2, ia=EIA2)
    ue, enb = _pair(cfg)
    pdu = bytearray(ue.tx(b"attach-request"))
    pdu[3] ^= 0x40
    assert enb.rx(bytes(pdu)) is None
    assert enb.integrity_failed == 1


def test_drb_12bit_hfn_carry():
    cfg = PdcpConfig(is_srb=False, bearer_id=1, sn_len=12, ea=EEA2)
    ue, enb = _pair(cfg)
    rng = np.random.default_rng(0)
    # push past one SN wrap to exercise the HFN carry
    ue.tx_count = 4090
    enb.rx_count = 4090
    for i in range(12):
        msg = rng.integers(0, 256, 20).astype(np.uint8).tobytes()
        assert enb.rx(ue.tx(msg)) == msg
    assert enb.rx_count == 4102  # crossed the 4096 boundary


def test_drb_7bit():
    cfg = PdcpConfig(is_srb=False, bearer_id=2, sn_len=7, ea=EEA1)
    ue, enb = _pair(cfg)
    for i in range(200):  # > one SN wrap at 128
        msg = bytes([i & 0xFF, 1, 2])
        assert enb.rx(ue.tx(msg)) == msg


def test_pdcp_over_rlc_am_stack():
    """PDCP -> RLC AM (lossy) -> PDCP: everything through, deciphered."""
    from srslte_tpu.rlc import RlcAm

    cfg = PdcpConfig(is_srb=False, bearer_id=1, ea=EEA2)
    ue_pdcp, enb_pdcp = _pair(cfg)
    tx_rlc, rx_rlc = RlcAm(poll_pdu=2, t_reordering=1), RlcAm(t_reordering=1)
    rng = np.random.default_rng(3)
    sdus = [rng.integers(0, 256, rng.integers(10, 80)).astype(np.uint8).tobytes()
            for _ in range(15)]
    for s in sdus:
        tx_rlc.write_sdu(ue_pdcp.tx(s))
    for _ in range(80):
        p = tx_rlc.read_pdu(60)
        if p is not None and rng.random() > 0.15:
            rx_rlc.write_pdu(p)
        rx_rlc.tick()
        tx_rlc.tick()
        st = rx_rlc.read_pdu(100)
        if st is not None:
            tx_rlc.write_pdu(st)
    for pdu in rx_rlc.rx_sdus:
        enb_pdcp.rx(pdu)
    assert enb_pdcp.rx_sdus == sdus

"""End-to-end attach + user-plane test (SURVEY.md §3.5 analog):

UE NAS <-> MME over a message bus, Milenage AKA on both sides, NAS security
mode (EEA2/EIA2), SPGW session creation, then user-plane packets flowing
UE -> [PDCP -> RLC AM] -> eNB -> GTP-U -> SPGW SGi and back.
"""

import numpy as np
import pytest

from srslte_tpu.epc import Hss, Mme, Spgw
from srslte_tpu.gtpu import GtpuHeader, gtpu_pack, gtpu_unpack
from srslte_tpu.security.milenage import compute_opc
from srslte_tpu.ue_stack import SoftUsim, UeNas

IMSI = "001010123456789"
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")


def _make_network():
    hss = Hss()
    hss.add_subscriber(IMSI, K, op=OP)
    spgw = Spgw()
    mme = Mme(hss, spgw)
    ue = UeNas(SoftUsim(IMSI, K, compute_opc(K, OP)))
    return ue, mme, spgw


def _run_attach(ue, mme, ue_id=1):
    ul = [ue.start_attach()]
    for _ in range(10):
        dl = []
        for pdu in ul:
            dl.extend(mme.rx_nas(ue_id, pdu))
        if not dl:
            break
        ul = []
        for pdu in dl:
            ul.extend(ue.rx_nas(pdu))
    return ue, mme


def test_attach_establishes_security_and_ip():
    ue, mme, spgw = _make_network()
    _run_attach(ue, mme)
    assert ue.state == "attached"
    assert ue.ip.startswith("172.16.0.")
    ctx = mme.ues[1]
    assert ctx.state == "attached"
    # both sides derived the same NAS keys
    assert ue.sec.k_int == ctx.sec.k_int
    assert ue.sec.k_enc == ctx.sec.k_enc
    assert ue.ip == spgw.by_ue_ip[ue.ip].ue_ip


def test_attach_unknown_imsi_rejected():
    ue, mme, _ = _make_network()
    ue.usim.imsi = "999999999999999"
    out = mme.rx_nas(2, ue.start_attach())
    assert out == []


def test_attach_wrong_key_fails_auth():
    ue, mme, _ = _make_network()
    ue.usim.key = bytes(16)  # wrong K: AUTN MAC check must fail on the UE
    dl = mme.rx_nas(3, ue.start_attach())
    with pytest.raises(ValueError, match="AUTN MAC"):
        ue.rx_nas(dl[0])


def test_user_plane_through_spgw():
    ue, mme, spgw = _make_network()
    _run_attach(ue, mme)
    sgi_out = []
    spgw.sgi_tx = lambda ip, pkt: sgi_out.append((ip, pkt))

    # UL: UE "IP packet" -> eNB wraps in GTP-U toward the SPGW
    pkt = b"ping-request-payload"
    gpdu = gtpu_pack(GtpuHeader(teid=ue.teid_ul), pkt)
    got = spgw.rx_s1u(gpdu)
    assert got == (ue.ip, pkt)
    assert sgi_out == [(ue.ip, pkt)]

    # DL: internet -> SPGW encapsulates toward the eNB with the DL TEID
    dl = spgw.tx_sgi(ue.ip, b"ping-reply")
    hdr, payload = gtpu_unpack(dl)
    assert payload == b"ping-reply"
    assert hdr.teid == mme.ues[1].teid_dl


def test_user_plane_over_pdcp_rlc():
    """The full UP stack: IP -> PDCP(ciphered) -> RLC AM -> GTP-U -> SGi."""
    from srslte_tpu.pdcp import PdcpConfig, PdcpEntity
    from srslte_tpu.rlc import RlcAm
    from srslte_tpu.security import EEA2

    ue, mme, spgw = _make_network()
    _run_attach(ue, mme)
    # DRB keys would come from K_eNB; reuse the NAS K_enc for the test
    cfg = PdcpConfig(is_srb=False, bearer_id=1, ea=EEA2)
    ue_pdcp = PdcpEntity(cfg, ue.sec.k_enc, is_ue=True)
    enb_pdcp = PdcpEntity(cfg, ue.sec.k_enc, is_ue=False)
    ue_rlc, enb_rlc = RlcAm(), RlcAm()

    packets = [bytes([i]) * (20 + i) for i in range(8)]
    for p in packets:
        ue_rlc.write_sdu(ue_pdcp.tx(p))
    while (pdu := ue_rlc.read_pdu(120)) is not None:
        enb_rlc.write_pdu(pdu)
    received = []
    for rlc_sdu in enb_rlc.rx_sdus:
        ip_pkt = enb_pdcp.rx(rlc_sdu)
        gpdu = gtpu_pack(GtpuHeader(teid=ue.teid_ul), ip_pkt)
        received.append(spgw.rx_s1u(gpdu)[1])
    assert received == packets


def test_nas_service_request_short_mac():
    """4-byte SERVICE REQUEST round-trips and rejects a tampered short MAC."""
    from srslte_tpu.nas.messages import (NasSecurityContext, ServiceRequest,
                                         nas_unpack)

    k = bytes(range(16))
    ue = NasSecurityContext(k_enc=k, k_int=k, ea=1, ia=1, direction=0,
                            tx_count=5)
    mme = NasSecurityContext(k_enc=k, k_int=k, ea=1, ia=1, direction=1,
                             rx_count=5)
    raw = ServiceRequest(ksi=3).pack(ue)
    assert len(raw) == 4
    msg, protected = nas_unpack(raw, mme)
    assert protected and isinstance(msg, ServiceRequest) and msg.ksi == 3
    assert mme.rx_count == 6
    bad = raw[:3] + bytes([raw[3] ^ 0xFF])
    import pytest as _pytest
    with _pytest.raises(ValueError):
        nas_unpack(bad, NasSecurityContext(k_enc=k, k_int=k, ea=1, ia=1,
                                           direction=1, rx_count=5))


def test_nas_tau_flow_protected():
    """TAU request/accept/complete through a ciphered+integrity context."""
    from srslte_tpu.nas.messages import (NasSecurityContext, TauAccept,
                                         TauComplete, TauRequest, nas_pack,
                                         nas_unpack)

    k = bytes(range(16, 32))
    ue = NasSecurityContext(k_enc=k, k_int=k, ea=2, ia=2, direction=0)
    mme = NasSecurityContext(k_enc=k, k_int=k, ea=2, ia=2, direction=1)
    raw = nas_pack(TauRequest(update_type=2, guti=0xCAFE01), sec_ctx=ue)
    msg, prot = nas_unpack(raw, mme)
    assert prot and isinstance(msg, TauRequest)
    assert msg.update_type == 2 and msg.guti == 0xCAFE01
    raw = nas_pack(TauAccept(update_result=0, guti=0xBEEF02, tac=0x1234),
                   sec_ctx=mme)
    acc, _ = nas_unpack(raw, ue)
    assert acc.guti == 0xBEEF02 and acc.tac == 0x1234
    raw = nas_pack(TauComplete(), sec_ctx=ue)
    assert isinstance(nas_unpack(raw, mme)[0], TauComplete)

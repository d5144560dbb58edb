"""NR L2 variants: RLC UM NR, PDCP NR, MAC PDU NR.

Reference behavior: lib/src/upper/{rlc_um_nr.cc, pdcp_entity_nr.cc},
lib/src/mac/mac_sch_pdu_nr.cc.
"""

import numpy as np
import pytest

from srslte_tpu.mac.pdu_nr import (LCID_C_RNTI, LCID_CON_RES, LCID_PAD,
                                   LCID_SHORT_BSR, MacPduNr)
from srslte_tpu.pdcp.entity_nr import PdcpEntityNr
from srslte_tpu.rlc.um_nr import (SI_FIRST, SI_FULL, SI_LAST, SI_MID,
                                  RlcUmNr, pack_um_nr, unpack_um_nr)


# -- RLC UM NR --------------------------------------------------------------

@pytest.mark.parametrize("sn_bits", [6, 12])
def test_um_nr_header_codec(sn_bits):
    for si, sn, so in ((SI_FULL, 0, 0), (SI_FIRST, 33, 0),
                       (SI_MID, 33, 700), (SI_LAST, 33, 1400)):
        raw = pack_um_nr(si, sn, so, b"payload", sn_bits)
        gsi, gsn, gso, pl = unpack_um_nr(raw, sn_bits)
        assert gsi == si and pl == b"payload"
        if si != SI_FULL:
            assert gsn == sn
        if si in (SI_MID, SI_LAST):
            assert gso == so
    # full SDU header is exactly one byte
    assert len(pack_um_nr(SI_FULL, 0, 0, b"", sn_bits)) == 1


@pytest.mark.parametrize("sn_bits", [6, 12])
def test_um_nr_segmentation_roundtrip(sn_bits):
    tx, rx = RlcUmNr(sn_bits=sn_bits), RlcUmNr(sn_bits=sn_bits)
    rng = np.random.default_rng(0)
    sdus = [rng.integers(0, 256, n).astype(np.uint8).tobytes()
            for n in (10, 300, 77, 1200)]
    for s in sdus:
        tx.write_sdu(s)
    while (p := tx.read_pdu(90)) is not None:
        rx.write_pdu(p)
    assert rx.rx_sdus == sdus


def test_um_nr_out_of_order_segments():
    tx, rx = RlcUmNr(), RlcUmNr()
    tx.write_sdu(bytes(range(250)))
    pdus = []
    while (p := tx.read_pdu(60)) is not None:
        pdus.append(p)
    assert len(pdus) >= 4
    for p in reversed(pdus):
        rx.write_pdu(p)
    assert rx.rx_sdus == [bytes(range(250))]


def test_um_nr_reassembly_timer_discards():
    tx, rx = RlcUmNr(t_reassembly=2), RlcUmNr(t_reassembly=2)
    tx.write_sdu(bytes(100))
    p1 = tx.read_pdu(40)
    _ = tx.read_pdu(40)  # lost
    p3 = tx.read_pdu(200)
    rx.write_pdu(p1)
    rx.write_pdu(p3)
    for _ in range(3):
        rx.tick()
    assert rx.rx_sdus == [] and not rx._rx_segs


# -- PDCP NR ----------------------------------------------------------------

@pytest.mark.parametrize("sn_bits", [12, 18])
def test_pdcp_nr_plain_roundtrip(sn_bits):
    a = PdcpEntityNr(sn_bits=sn_bits)
    b = PdcpEntityNr(sn_bits=sn_bits)
    for i in range(5):
        pdu = a.tx(bytes([i]) * 20)
        assert b.rx(pdu) == bytes([i]) * 20
    assert b.rx_next == 5


def test_pdcp_nr_ciphered_integrity():
    k = bytes(range(16))
    a = PdcpEntityNr(k_enc=k, k_int=k, is_srb=True)
    b = PdcpEntityNr(k_enc=k, k_int=k, is_srb=True)
    msg = b"nr control message"
    pdu = a.tx(msg)
    assert msg not in pdu  # actually ciphered
    assert b.rx(pdu) == msg
    # tampering must fail integrity
    bad = pdu[:-1] + bytes([pdu[-1] ^ 1])
    assert b.rx(bad) is None and b.integrity_failures == 1


def test_pdcp_nr_sn_wrap_count_inference():
    a = PdcpEntityNr(sn_bits=12)
    b = PdcpEntityNr(sn_bits=12)
    a.tx_next = (1 << 12) - 2  # about to wrap
    b.rx_next = (1 << 12) - 2
    for i in range(5):  # crosses the SN wrap -> HFN increment
        assert b.rx(a.tx(bytes([i]))) == bytes([i])
    assert b.rx_next == a.tx_next == (1 << 12) + 3


# -- MAC PDU NR -------------------------------------------------------------

def test_mac_pdu_nr_dl_roundtrip():
    pdu = MacPduNr(is_ul=False)
    pdu.add_ce(LCID_CON_RES, bytes(range(6)))
    pdu.add_sdu(1, b"srb1 rrc message")
    pdu.add_sdu(4, b"x" * 300)  # forces the 16-bit L form
    raw = pdu.pack(tb_size=400)
    assert len(raw) == 400
    got = MacPduNr.unpack(raw, is_ul=False)
    assert got.ces() == [(LCID_CON_RES, bytes(range(6)))]
    assert got.sdus(1) == [b"srb1 rrc message"]
    assert got.sdus(4) == [b"x" * 300]


def test_mac_pdu_nr_ul_ce_placement():
    pdu = MacPduNr(is_ul=True)
    pdu.add_sdu(3, b"data")
    pdu.add_ce(LCID_SHORT_BSR, b"\x2a")
    pdu.add_ce(LCID_C_RNTI, b"\x12\x34")
    raw = pdu.pack()
    # UL: CEs come AFTER the SDUs (38.321 §6.1.2)
    assert raw.index(b"data") < raw.index(b"\x12\x34")
    got = MacPduNr.unpack(raw, is_ul=True)
    assert (LCID_C_RNTI, b"\x12\x34") in got.ces()
    assert got.sdus(3) == [b"data"]


def test_mac_pdu_nr_padding_absorbs_tail():
    pdu = MacPduNr()
    pdu.add_sdu(1, b"ab")
    raw = pdu.pack(tb_size=32)
    got = MacPduNr.unpack(raw)
    assert got.sdus() == [b"ab"]
    assert LCID_PAD not in [l for l, _ in got.subpdus]


# -- NR CSI-RS (csi_rs.c) ---------------------------------------------------

def test_csi_rs_mapping_and_measure():
    import jax.numpy as jnp

    from srslte_tpu.phy.nr.csi_rs import NzpCsiRs, csi_rs_measure, csi_rs_put
    from srslte_tpu.phy.nr.params import NSYMB_SLOT, NrCarrier

    car = NrCarrier(n_prb=52, n_id=11)
    res = NzpCsiRs(row=1, freq_alloc=0b0010, l0=4, scrambling_id=7)
    assert res.k0 == 2 and res.k_list() == (2, 6, 10)
    grid = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    grid = csi_rs_put(res, car, slot=3, grid=grid)
    # only symbol l0 is populated, 3 REs per PRB
    g = np.asarray(grid)
    assert np.abs(g[4]).sum() > 0 and np.abs(g[[0, 3, 5]]).sum() == 0
    assert int((np.abs(g[4]) > 0).sum()) == 3 * 52

    rng = np.random.default_rng(0)
    h0 = 0.8 * np.exp(0.9j)
    rx = g * h0 + 0.05 * (rng.standard_normal(g.shape)
                          + 1j * rng.standard_normal(g.shape))
    m = csi_rs_measure(res, car, 3, jnp.asarray(rx.astype(np.complex64)))
    assert abs(float(m["rsrp"]) - abs(h0) ** 2) < 0.05
    snr_true = 10 * np.log10(abs(h0) ** 2 / (2 * 0.05**2))
    assert abs(float(m["snr_db"]) - snr_true) < 2.0


def test_csi_rs_periodicity_and_row2():
    import jax.numpy as jnp

    from srslte_tpu.phy.nr.csi_rs import NzpCsiRs, csi_rs_put
    from srslte_tpu.phy.nr.params import NSYMB_SLOT, NrCarrier

    car = NrCarrier(n_prb=24, n_id=3)
    res = NzpCsiRs(row=2, freq_alloc=1 << 6, l0=12, period=20, offset=4)
    assert res.send_in(4) and res.send_in(24) and not res.send_in(5)
    grid = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    out = csi_rs_put(res, car, slot=5, grid=grid)  # off-period: untouched
    assert not np.abs(np.asarray(out)).any()
    out = csi_rs_put(res, car, slot=24, grid=grid)
    g = np.asarray(out)
    assert int((np.abs(g[12]) > 0).sum()) == 24  # density 1: one RE per PRB


# -- NR RLC AM PDU codecs (rlc_am_nr.cc; vectors from rlc_am_nr_pdu_test.cc)

def test_rlc_am_nr_data_header_vectors():
    from srslte_tpu.rlc import (AmNrHeader, pack_am_nr, unpack_am_nr,
                                is_control_pdu)

    payload = bytes([0x11, 0x22, 0x33, 0x44])
    # 12-bit complete SDU (test1)
    tv = bytes([0x80, 0x00]) + payload
    h, p = unpack_am_nr(tv, 12)
    assert h.si == 0 and h.sn == 0 and h.p == 0 and p == payload
    assert pack_am_nr(h, p, 12) == tv
    assert not is_control_pdu(tv)
    # 12-bit first segment, P flag, SN 511 (test2)
    tv = bytes([0xD1, 0xFF]) + payload
    h, p = unpack_am_nr(tv, 12)
    assert h.si == 1 and h.sn == 511 and h.p == 1 and h.so == 0
    assert pack_am_nr(h, p, 12) == tv
    # 12-bit last segment, SN 0x404, SO 0x404 (test3 pack side)
    tv = bytes([0xA4, 0x04, 0x04, 0x04]) + payload
    h, p = unpack_am_nr(tv, 12)
    assert h.si == 2 and h.sn == 0x404 and h.so == 0x404 and p == payload
    assert pack_am_nr(h, p, 12) == tv
    # ... and an 18-bit read of it is malformed (reserved bits, test3)
    assert unpack_am_nr(tv, 18) is None
    # 18-bit full SDU with P flag, SN 131586 (test4)
    tv = bytes([0xC2, 0x02, 0x02]) + payload
    h, p = unpack_am_nr(tv, 18)
    assert h.si == 0 and h.sn == 131586 and h.p == 1
    assert pack_am_nr(h, p, 18) == tv
    # 18-bit middle segment with SO (test5)
    tv = bytes([0xB2, 0x00, 0xFF, 0x02, 0x02]) + payload
    h, p = unpack_am_nr(tv, 18)
    assert h.si == 3 and h.sn == 0x200FF and h.so == 0x0202
    assert pack_am_nr(h, p, 18) == tv
    # reserved bits set (test6): malformed
    assert unpack_am_nr(bytes([0xB7, 0x00, 0xFF, 0x02, 0x02]), 18) is None


def test_rlc_am_nr_status_vectors():
    from srslte_tpu.rlc import (AmNrStatus, is_control_pdu,
                                pack_am_nr_status, unpack_am_nr_status)

    # ACK_SN=2065, no NACK (control_pdu_test1)
    tv = bytes([0x08, 0x11, 0x00])
    assert is_control_pdu(tv)
    s = unpack_am_nr_status(tv, 12)
    assert s.ack_sn == 2065 and s.nacks == []
    assert pack_am_nr_status(s, 12) == tv
    # ACK_SN=2065, NACK_SN=273 (control_pdu_test2)
    tv = bytes([0x08, 0x11, 0x80, 0x11, 0x10])
    s = unpack_am_nr_status(tv, 12)
    assert s.ack_sn == 2065 and s.nacks == [273]
    assert pack_am_nr_status(s, 12) == tv
    # multi-NACK round trip (E1 chaining in the nack flag half-byte)
    s = AmNrStatus(ack_sn=100, nacks=[5, 9, 4095])
    assert unpack_am_nr_status(pack_am_nr_status(s, 12), 12) == s
    # malformed: reserved bits after ACK_SN
    assert unpack_am_nr_status(bytes([0x08, 0x11, 0x40]), 12) is None
    # data PDU rejected as status
    assert unpack_am_nr_status(bytes([0x80, 0x00]), 12) is None

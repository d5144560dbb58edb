"""TFT packet filters (tft_packet_filter.cc analog)."""

import struct

from srslte_tpu.nas.tft import (IPV4_REMOTE_ADDR, IPV6_REMOTE_ADDR_LEN,
                                LOCAL_PORT_RANGE, PROTOCOL_ID,
                                SINGLE_REMOTE_PORT, TYPE_OF_SERVICE,
                                TftFilter, TftMatcher)


def ipv4(src="172.16.0.2", dst="8.8.8.8", proto=17, sport=5000, dport=53,
         tos=0):
    hdr = struct.pack("!BBHHHBBH4s4s", 0x45, tos, 28, 0, 0, 64, proto, 0,
                      bytes(map(int, src.split("."))),
                      bytes(map(int, dst.split("."))))
    return hdr + struct.pack("!HHHH", sport, dport, 8, 0)


def ipv6(dst_prefix=b"\x20\x01\x0d\xb8", nexthdr=17, sport=1, dport=2,
         flow=b"\x01\x02\x03"):
    dst = dst_prefix + bytes(16 - len(dst_prefix))
    hdr = bytes([0x60 | (flow[0] & 0x0F) >> 4]) + bytes([flow[0] & 0x0F]) \
        + flow[1:3] + struct.pack("!HBB", 8, nexthdr, 64) + bytes(16) + dst
    return hdr + struct.pack("!HHHH", sport, dport, 8, 0)


def test_parse_and_match_ipv4_remote_and_port():
    comp = bytes([IPV4_REMOTE_ADDR]) + bytes([8, 8, 8, 8]) \
        + bytes([255, 255, 255, 255]) \
        + bytes([SINGLE_REMOTE_PORT]) + struct.pack("!H", 53) \
        + bytes([PROTOCOL_ID, 17])
    f = TftFilter.parse(5, 4, comp, eval_precedence=1)
    assert f.match(ipv4(dst="8.8.8.8", dport=53))
    assert not f.match(ipv4(dst="8.8.4.4", dport=53))  # address mismatch
    assert not f.match(ipv4(dst="8.8.8.8", dport=80))  # port mismatch
    assert not f.match(ipv4(dst="8.8.8.8", proto=6, dport=53))  # proto


def test_masked_address_and_port_range_order_normalized():
    comp = bytes([IPV4_REMOTE_ADDR]) + bytes([10, 0, 0, 0]) \
        + bytes([255, 0, 0, 0]) \
        + bytes([LOCAL_PORT_RANGE]) + struct.pack("!HH", 2000, 1000)
    f = TftFilter.parse(5, 4, comp)
    assert f.local_port_range == (1000, 2000)  # wrong order fixed
    assert f.match(ipv4(dst="10.99.1.2", sport=1500))
    assert not f.match(ipv4(dst="11.0.0.1", sport=1500))
    assert not f.match(ipv4(dst="10.0.0.1", sport=2500))


def test_type_of_service_mask():
    comp = bytes([TYPE_OF_SERVICE, 0xB8, 0xFC])
    f = TftFilter.parse(5, 4, comp)
    assert f.match(ipv4(tos=0xB8))
    assert f.match(ipv4(tos=0xB9))  # outside the mask
    assert not f.match(ipv4(tos=0x00))


def test_ipv6_prefix_length():
    comp = bytes([IPV6_REMOTE_ADDR_LEN]) \
        + b"\x20\x01\x0d\xb8" + bytes(12) + bytes([32])
    f = TftFilter.parse(5, 4, comp)
    assert f.match(ipv6(dst_prefix=b"\x20\x01\x0d\xb8"))
    assert not f.match(ipv6(dst_prefix=b"\x20\x01\x0d\xb9"))


def test_matcher_precedence_and_default():
    m = TftMatcher(default_lcid=3)
    dns = TftFilter.parse(
        5, 4, bytes([SINGLE_REMOTE_PORT]) + struct.pack("!H", 53),
        eval_precedence=10)
    anyudp = TftFilter.parse(6, 5, bytes([PROTOCOL_ID, 17]),
                             eval_precedence=20)
    m.add_filter(anyudp)
    m.add_filter(dns)  # lower precedence value evaluates first
    assert m.check_match(ipv4(dport=53)) == 4
    assert m.check_match(ipv4(dport=80)) == 5  # udp catch-all
    assert m.check_match(ipv4(proto=6, dport=80)) == 3  # default bearer
    m.remove_bearer(5)
    assert m.check_match(ipv4(dport=53)) == 5  # dns filter gone -> udp


def test_empty_filter_never_matches():
    f = TftFilter.parse(5, 4, b"")
    assert not f.match(ipv4())


def test_flow_label_spare_bits_masked():
    from srslte_tpu.nas.tft import FLOW_LABEL, TftFilter

    # spare high nibble set in the component must not block a match
    f = TftFilter.parse(5, 4, bytes([FLOW_LABEL, 0x71, 0x02, 0x03]))
    assert f.flow_label == b"\x01\x02\x03"
    assert f.match(ipv6(flow=b"\x01\x02\x03"))


def test_truncated_component_rejected():
    import pytest as _p

    from srslte_tpu.nas.tft import IPV4_REMOTE_ADDR, TftFilter

    with _p.raises(ValueError):
        TftFilter.parse(5, 4, bytes([IPV4_REMOTE_ADDR, 8, 8, 8]))


def test_ue_send_data_consults_tft(monkeypatch):
    """The UE's uplink path routes through the TFT matcher (live code)."""
    from srslte_tpu.nas.tft import SINGLE_REMOTE_PORT, TftFilter
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.ue import UeApp
    from srslte_tpu.ue_stack import SoftUsim, UeNas

    ue = UeApp(Cell(n_prb=15, id=1, nof_ports=1),
               UeNas(SoftUsim("001010123456789", bytes(16), bytes(16))))

    class FakeBearer:
        def __init__(self):
            self.sdus = []

        def write_sdu(self, sdu):
            self.sdus.append(sdu)

    class FakePdcp:
        def tx(self, pkt):
            return pkt

    default, dedicated = FakeBearer(), FakeBearer()
    ue.drb1, ue.pdcp_drb = default, FakePdcp()
    monkeypatch.setattr(
        UeApp, "bearers",
        property(lambda self: {3: (self.drb1, self.pdcp_drb),
                               4: (dedicated, FakePdcp())}))
    ue.tft.add_filter(TftFilter.parse(
        6, 4, bytes([SINGLE_REMOTE_PORT]) + (53).to_bytes(2, "big"),
        eval_precedence=1))
    ue.send_data(ipv4(dport=53))  # DNS -> dedicated bearer (lcid 4)
    ue.send_data(ipv4(dport=80))  # unmatched -> default DRB
    assert len(dedicated.sdus) == 1
    assert len(default.sdus) == 1

"""MAC-LTE PCAP writer (mac_pcap.cc / pcap.c equivalent).

Reference behavior: lib/src/common/{pcap.c, mac_pcap_base.cc} — classic
pcap file format with the Wireshark mac-lte-framed encapsulation: each
packet is the MAC_LTE_START marker payload ("mac-lte") + tag-value headers
(radio type, direction, RNTI type/value, subframe) + the MAC PDU, wrapped
in a UDP/IP/Ethernet frame on port 9999 (udp-framing mode, CHANGELOG:12).
"""

from __future__ import annotations

import struct
import time
from dataclasses import dataclass

DLT_EN10MB = 1
MAC_LTE_START = b"mac-lte"
# mac-lte framing tags (packet-mac-lte.h conventions)
TAG_RNTI = 0x02
TAG_UEID = 0x03
TAG_SUBFRAME = 0x04
TAG_PAYLOAD = 0x01

DIR_UPLINK = 0
DIR_DOWNLINK = 1
RNTI_TYPE_C = 3


@dataclass
class MacPcap:
    path: str
    ue_id: int = 1

    def __post_init__(self):
        self._f = open(self.path, "wb")
        # pcap global header: magic, v2.4, tz 0, sigfigs 0, snaplen, DLT
        self._f.write(struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0,
                                  65535, DLT_EN10MB))

    def _udp_frame(self, payload: bytes) -> bytes:
        eth = bytes(12) + struct.pack("!H", 0x0800)
        ip_len = 20 + 8 + len(payload)
        ip = struct.pack("!BBHHHBBH4s4s", 0x45, 0, ip_len, 0, 0, 64, 17, 0,
                         bytes([127, 0, 0, 1]), bytes([127, 0, 0, 1]))
        udp = struct.pack("!HHHH", 9999, 9999, 8 + len(payload), 0)
        return eth + ip + udp + payload

    def write_pdu(self, pdu: bytes, rnti: int, tti: int,
                  direction: int = DIR_DOWNLINK):
        ctx = (bytes([1, direction, RNTI_TYPE_C])  # radio type FDD, dir, rnti type
               + bytes([TAG_RNTI]) + struct.pack("!H", rnti)
               + bytes([TAG_UEID]) + struct.pack("!H", self.ue_id)
               + bytes([TAG_SUBFRAME]) + struct.pack("!H", tti % 10)
               + bytes([TAG_PAYLOAD]))
        frame = self._udp_frame(MAC_LTE_START + ctx + pdu)
        ts = time.time()
        self._f.write(struct.pack("<IIII", int(ts), int((ts % 1) * 1e6),
                                  len(frame), len(frame)))
        self._f.write(frame)

    def close(self):
        self._f.close()

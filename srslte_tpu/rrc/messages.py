"""RRC message codec — a hand-written subset (36.331 message set).

Reference behavior: the reference carries RRC as generated ASN.1 PER
(lib/src/asn1/rrc/*, ~110k LoC); this framework uses a compact hand-written
TLV encoding of the same message set and fields needed by the connection /
attach / reconfiguration procedures.  The wire format is therefore NOT
interoperable with ASN.1 PER peers — the procedure logic, message flow and
field semantics match (srsue rrc.cc / srsenb rrc.cc).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

MT = {
    "ConnectionRequest": 1, "ConnectionSetup": 2, "ConnectionSetupComplete": 3,
    "DlInformationTransfer": 4, "UlInformationTransfer": 5,
    "RrcSecurityModeCommand": 6, "RrcSecurityModeComplete": 7,
    "ConnectionReconfiguration": 8, "ConnectionReconfigurationComplete": 9,
    "Sib1": 10, "Paging": 11, "ConnectionRelease": 12,
}


@dataclass
class ConnectionRequest:
    ue_identity: bytes  # 40-bit random value / S-TMSI
    cause: int = 0  # mo-Data

    def pack_body(self):
        return bytes([self.cause, len(self.ue_identity)]) + self.ue_identity

    @staticmethod
    def unpack_body(b):
        return ConnectionRequest(cause=b[0], ue_identity=b[2 : 2 + b[1]])


@dataclass
class ConnectionSetup:
    srb1_config: int = 1  # placeholder radio resource config id

    def pack_body(self):
        return bytes([self.srb1_config])

    @staticmethod
    def unpack_body(b):
        return ConnectionSetup(srb1_config=b[0])


@dataclass
class ConnectionSetupComplete:
    nas_pdu: bytes = b""

    def pack_body(self):
        return struct.pack("!H", len(self.nas_pdu)) + self.nas_pdu

    @staticmethod
    def unpack_body(b):
        n = struct.unpack("!H", b[:2])[0]
        return ConnectionSetupComplete(nas_pdu=b[2 : 2 + n])


@dataclass
class DlInformationTransfer:
    nas_pdu: bytes

    def pack_body(self):
        return struct.pack("!H", len(self.nas_pdu)) + self.nas_pdu

    @staticmethod
    def unpack_body(b):
        n = struct.unpack("!H", b[:2])[0]
        return DlInformationTransfer(nas_pdu=b[2 : 2 + n])


@dataclass
class UlInformationTransfer:
    nas_pdu: bytes

    def pack_body(self):
        return struct.pack("!H", len(self.nas_pdu)) + self.nas_pdu

    @staticmethod
    def unpack_body(b):
        n = struct.unpack("!H", b[:2])[0]
        return UlInformationTransfer(nas_pdu=b[2 : 2 + n])


@dataclass
class RrcSecurityModeCommand:
    ea: int
    ia: int

    def pack_body(self):
        return bytes([(self.ea << 4) | self.ia])

    @staticmethod
    def unpack_body(b):
        return RrcSecurityModeCommand(ea=b[0] >> 4, ia=b[0] & 0xF)


@dataclass
class RrcSecurityModeComplete:
    def pack_body(self):
        return b""

    @staticmethod
    def unpack_body(b):
        return RrcSecurityModeComplete()


@dataclass
class ConnectionReconfiguration:
    drb_id: int = 1
    nas_pdu: bytes = b""

    def pack_body(self):
        return bytes([self.drb_id]) + struct.pack("!H", len(self.nas_pdu)) + self.nas_pdu

    @staticmethod
    def unpack_body(b):
        n = struct.unpack("!H", b[1:3])[0]
        return ConnectionReconfiguration(drb_id=b[0], nas_pdu=b[3 : 3 + n])


@dataclass
class ConnectionReconfigurationComplete:
    def pack_body(self):
        return b""

    @staticmethod
    def unpack_body(b):
        return ConnectionReconfigurationComplete()


@dataclass
class Sib1:
    """System information block 1 (cell access info, lite)."""

    plmn: bytes = bytes.fromhex("00f110")
    tac: int = 1
    cell_id: int = 0x0019B01
    si_periodicity: int = 8

    def pack_body(self):
        return self.plmn + struct.pack("!HI", self.tac, self.cell_id) \
            + bytes([self.si_periodicity])

    @staticmethod
    def unpack_body(b):
        tac, cid = struct.unpack("!HI", b[3:9])
        return Sib1(plmn=b[:3], tac=tac, cell_id=cid, si_periodicity=b[9])


@dataclass
class Paging:
    """PCCH Paging (36.331 §6.2.2): list of S-TMSI paging records.

    srsenb broadcasts this on the paging occasion derived from
    ue_id mod 1024 (36.304 §7); the PO/PF math lives with the caller —
    this is the message body (srsue rrc.cc handle_paging).
    """

    records: tuple = ()  # tuple of 4-byte m-tmsi ints

    def pack_body(self):
        out = bytes([len(self.records)])
        for tmsi in self.records:
            out += struct.pack("!I", tmsi)
        return out

    @staticmethod
    def unpack_body(b):
        n = b[0]
        recs = struct.unpack(f"!{n}I", b[1 : 1 + 4 * n]) if n else ()
        return Paging(records=tuple(recs))


@dataclass
class ConnectionRelease:
    """RRCConnectionRelease (36.331 §5.3.8): cause + optional redirect."""

    cause: int = 0  # 0 = other, 1 = load-balancing, 2 = rlf
    redirect_earfcn: int = 0  # 0 = none

    def pack_body(self):
        return bytes([self.cause]) + struct.pack("!I", self.redirect_earfcn)

    @staticmethod
    def unpack_body(b):
        return ConnectionRelease(cause=b[0],
                                 redirect_earfcn=struct.unpack("!I",
                                                               b[1:5])[0])


_BY_ID = {}
for _name, _id in MT.items():
    _BY_ID[_id] = globals()[_name]


def rrc_pack(msg) -> bytes:
    return bytes([MT[type(msg).__name__]]) + msg.pack_body()


def rrc_unpack(raw: bytes):
    return _BY_ID[raw[0]].unpack_body(raw[1:])

"""RRC message API — dataclass views over real 36.331 UNALIGNED PER.

Reference behavior: srsue/srsenb RRC procedures exchange the generated
ASN.1 classes (lib/src/asn1/rrc/*); here the stack passes compact
dataclasses and `rrc_pack`/`rrc_unpack` convert them to/from the actual
36.331 PER wire format (schemas in asn1_rrc.py, byte-exact against the
reference's test vectors per tests/test_asn1_per.py).  The wire is
therefore interoperable with any 36.331 peer; the dataclasses carry only
the fields the procedures consume, with spec defaults for the rest.

Each message type lives on exactly one logical channel, so packing needs
no channel hint; unpacking takes the channel the transport delivered on
(SRB0 UL -> "ul_ccch", SRB1 DL -> "dl_dcch", BCCH, PCCH, ...), exactly as
the reference selects a codec per channel (srsue/src/stack/rrc/rrc.cc
parse_dl_ccch/parse_dl_dcch).
"""

from __future__ import annotations

from dataclasses import dataclass

from . import asn1_rrc as S
from .per import BitReader

EST_CAUSES = ("emergency", "high_prio_access", "mt_access", "mo_sig",
              "mo_data", "delay_tolerant_access_v1020", "mo_voice_call_v1280",
              "spare1")
REL_CAUSES = ("load_balancing_ta_urequired", "other",
              "cs_fallback_high_prio_v1020", "rrc_suspend_v1320")
EA_NAMES = ("eea0", "eea1", "eea2", "eea3_v1130")
IA_NAMES = ("eia0_v920", "eia1", "eia2", "eia3_v1130")
SI_PERIOD = {8: "rf8", 16: "rf16", 32: "rf32", 64: "rf64", 128: "rf128",
             256: "rf256", 512: "rf512"}


def _plmn_to_tree(plmn: bytes) -> dict:
    """3-byte BCD PLMN (24.301 9.9.3.32 order) -> mcc/mnc digit lists."""
    d = [plmn[0] & 0xF, plmn[0] >> 4, plmn[1] & 0xF,
         plmn[2] & 0xF, plmn[2] >> 4, plmn[1] >> 4]
    mnc = d[3:5] if d[5] == 0xF else d[3:6]
    return {"mcc": d[:3], "mnc": mnc}


def _plmn_from_tree(t: dict) -> bytes:
    mcc = t.get("mcc", [0, 0, 0])
    mnc = list(t["mnc"])
    d6 = 0xF if len(mnc) == 2 else mnc[2]
    return bytes([(mcc[1] << 4) | mcc[0], (d6 << 4) | mcc[2],
                  (mnc[1] << 4) | mnc[0]])


@dataclass
class ConnectionRequest:
    ue_identity: bytes  # 40-bit random value
    cause: int = 4  # index into EST_CAUSES (mo-Data)

    _channel = "ul_ccch"

    def to_tree(self):
        return ("rrc_conn_request", {"crit_exts": (
            "rrc_conn_request_r8",
            {"ue_id": ("random_value",
                       int.from_bytes(self.ue_identity[:5], "big")),
             "establishment_cause": EST_CAUSES[self.cause],
             "spare": 0})})

    @staticmethod
    def from_tree(t):
        r8 = t["crit_exts"][1]
        return ConnectionRequest(
            ue_identity=r8["ue_id"][1].to_bytes(5, "big"),
            cause=EST_CAUSES.index(r8["establishment_cause"]))


@dataclass
class ConnectionSetup:
    srb1_config: int = 1  # 1 = default SRB1 configuration (36.331 9.2.1)

    _channel = "dl_ccch"

    def to_tree(self):
        rr = {"srb_to_add_mod_list": [{"srb_id": 1}]}
        return ("rrc_conn_setup", {
            "rrc_transaction_id": 0,
            "crit_exts": ("c1", ("rrc_conn_setup_r8", {"rr_cfg_ded": rr}))})

    @staticmethod
    def from_tree(t):
        rr = t["crit_exts"][1][1]["rr_cfg_ded"]
        srbs = rr.get("srb_to_add_mod_list", [])
        return ConnectionSetup(srb1_config=srbs[0]["srb_id"] if srbs else 0)


@dataclass
class ConnectionSetupComplete:
    nas_pdu: bytes = b""

    _channel = "ul_dcch"

    def to_tree(self):
        return ("rrc_conn_setup_complete", {
            "rrc_transaction_id": 0,
            "crit_exts": ("c1", ("rrc_conn_setup_complete_r8",
                                 {"sel_plmn_id": 1,
                                  "ded_info_nas": self.nas_pdu}))})

    @staticmethod
    def from_tree(t):
        return ConnectionSetupComplete(
            nas_pdu=t["crit_exts"][1][1]["ded_info_nas"])


@dataclass
class DlInformationTransfer:
    nas_pdu: bytes

    _channel = "dl_dcch"

    def to_tree(self):
        return ("dl_info_transfer", {
            "rrc_transaction_id": 0,
            "crit_exts": ("c1", ("dl_info_transfer_r8",
                                 {"ded_info_type":
                                  ("ded_info_nas", self.nas_pdu)}))})

    @staticmethod
    def from_tree(t):
        return DlInformationTransfer(
            nas_pdu=t["crit_exts"][1][1]["ded_info_type"][1])


@dataclass
class UlInformationTransfer:
    nas_pdu: bytes

    _channel = "ul_dcch"

    def to_tree(self):
        return ("ul_info_transfer", {"crit_exts": ("c1", (
            "ul_info_transfer_r8",
            {"ded_info_type": ("ded_info_nas", self.nas_pdu)}))})

    @staticmethod
    def from_tree(t):
        return UlInformationTransfer(
            nas_pdu=t["crit_exts"][1][1]["ded_info_type"][1])


@dataclass
class RrcSecurityModeCommand:
    ea: int
    ia: int

    _channel = "dl_dcch"

    def to_tree(self):
        return ("security_mode_cmd", {
            "rrc_transaction_id": 0,
            "crit_exts": ("c1", ("security_mode_cmd_r8", {
                "security_cfg_smc": {"security_algorithm_cfg": {
                    "ciphering_algorithm": EA_NAMES[self.ea],
                    "integrity_prot_algorithm": IA_NAMES[self.ia]}}}))})

    @staticmethod
    def from_tree(t):
        alg = t["crit_exts"][1][1]["security_cfg_smc"][
            "security_algorithm_cfg"]
        return RrcSecurityModeCommand(
            ea=EA_NAMES.index(alg["ciphering_algorithm"]),
            ia=IA_NAMES.index(alg["integrity_prot_algorithm"]))


@dataclass
class RrcSecurityModeComplete:
    _channel = "ul_dcch"

    def to_tree(self):
        return ("security_mode_complete", {
            "rrc_transaction_id": 0,
            "crit_exts": ("security_mode_complete_r8", {})})

    @staticmethod
    def from_tree(t):
        return RrcSecurityModeComplete()


@dataclass
class ConnectionReconfiguration:
    drb_id: int = 1
    nas_pdu: bytes = b""

    _channel = "dl_dcch"

    def to_tree(self):
        r8 = {"rr_cfg_ded": {"drb_to_add_mod_list": [
            {"eps_bearer_id": 5, "drb_id": self.drb_id, "lc_ch_id": 3}]}}
        if self.nas_pdu:
            r8["ded_info_nas_list"] = [self.nas_pdu]
        return ("rrc_conn_recfg", {
            "rrc_transaction_id": 0,
            "crit_exts": ("c1", ("rrc_conn_recfg_r8", r8))})

    @staticmethod
    def from_tree(t):
        r8 = t["crit_exts"][1][1]
        nas = r8.get("ded_info_nas_list", [b""])
        drbs = r8.get("rr_cfg_ded", {}).get("drb_to_add_mod_list", [])
        return ConnectionReconfiguration(
            drb_id=drbs[0]["drb_id"] if drbs else 1, nas_pdu=nas[0])


@dataclass
class ConnectionReconfigurationComplete:
    _channel = "ul_dcch"

    def to_tree(self):
        return ("rrc_conn_recfg_complete", {
            "rrc_transaction_id": 0,
            "crit_exts": ("rrc_conn_recfg_complete_r8", {})})

    @staticmethod
    def from_tree(t):
        return ConnectionReconfigurationComplete()


@dataclass
class Sib1:
    """SystemInformationBlockType1 (the fields the stack consumes)."""

    plmn: bytes = bytes.fromhex("00f110")
    tac: int = 1
    cell_id: int = 0x0019B01
    si_periodicity: int = 8

    _channel = "bcch"

    def to_tree(self):
        return ("sib_type1", {
            "cell_access_related_info": {
                "plmn_id_list": [{"plmn_id": _plmn_to_tree(self.plmn),
                                  "cell_reserved_for_oper": "not_reserved"}],
                "tac": self.tac,
                "cell_id": self.cell_id,
                "cell_barred": "not_barred",
                "intra_freq_resel": "allowed",
                "csg_ind": False},
            "cell_sel_info": {"q_rx_lev_min": -70},
            "freq_band_ind": 7,
            "sched_info_list": [{"si_periodicity":
                                 SI_PERIOD[self.si_periodicity],
                                 "sib_map_info": []}],
            "si_win_len": "ms40",
            "sys_info_value_tag": 0})

    @staticmethod
    def from_tree(t):
        cell = t["cell_access_related_info"]
        per_name = t["sched_info_list"][0]["si_periodicity"]
        return Sib1(plmn=_plmn_from_tree(cell["plmn_id_list"][0]["plmn_id"]),
                    tac=cell["tac"], cell_id=cell["cell_id"],
                    si_periodicity=int(per_name[2:]))


@dataclass
class Paging:
    """PCCH Paging: S-TMSI paging records (36.331 6.2.2, PO/PF math with
    the caller per 36.304 7)."""

    records: tuple = ()  # of 32-bit m-tmsi ints

    _channel = "pcch"

    def to_tree(self):
        body = {}
        if self.records:
            body["paging_record_list"] = [
                {"ue_id": ("s_tmsi", {"mmec": 0, "m_tmsi": tmsi}),
                 "cn_domain": "ps"} for tmsi in self.records]
        return ("paging", body)

    @staticmethod
    def from_tree(t):
        return Paging(records=tuple(
            r["ue_id"][1]["m_tmsi"]
            for r in t.get("paging_record_list", [])
            if r["ue_id"][0] == "s_tmsi"))


@dataclass
class ConnectionRelease:
    """RRCConnectionRelease: cause name + optional EUTRA redirect."""

    cause: str = "other"  # name in REL_CAUSES
    redirect_earfcn: int = 0  # 0 = none

    _channel = "dl_dcch"

    def to_tree(self):
        r8 = {"release_cause": self.cause}
        if self.redirect_earfcn:
            r8["redirected_carrier_info"] = ("eutra", self.redirect_earfcn)
        return ("rrc_conn_release", {
            "rrc_transaction_id": 0,
            "crit_exts": ("c1", ("rrc_conn_release_r8", r8))})

    @staticmethod
    def from_tree(t):
        r8 = t["crit_exts"][1][1]
        redirect = r8.get("redirected_carrier_info", (None, 0))
        return ConnectionRelease(
            cause=r8["release_cause"],
            redirect_earfcn=redirect[1] if redirect[0] == "eutra" else 0)


# channel schema + the message types it carries (alternative name -> class)
CHANNELS = {
    "ul_ccch": (S.UL_CCCH_MESSAGE, {"rrc_conn_request": ConnectionRequest}),
    "dl_ccch": (S.DL_CCCH_MESSAGE, {"rrc_conn_setup": ConnectionSetup}),
    "ul_dcch": (S.UL_DCCH_MESSAGE, {
        "rrc_conn_setup_complete": ConnectionSetupComplete,
        "ul_info_transfer": UlInformationTransfer,
        "security_mode_complete": RrcSecurityModeComplete,
        "rrc_conn_recfg_complete": ConnectionReconfigurationComplete}),
    "dl_dcch": (S.DL_DCCH_MESSAGE, {
        "dl_info_transfer": DlInformationTransfer,
        "security_mode_cmd": RrcSecurityModeCommand,
        "rrc_conn_recfg": ConnectionReconfiguration,
        "rrc_conn_release": ConnectionRelease}),
    "bcch": (S.BCCH_DL_SCH_MESSAGE, {"sib_type1": Sib1}),
    "pcch": (S.PCCH_MESSAGE, {"paging": Paging}),
}

_TYPE_CHANNEL = {cls: ch for ch, (_, m) in CHANNELS.items()
                 for cls in m.values()}


def rrc_pack(msg) -> bytes:
    schema, _ = CHANNELS[_TYPE_CHANNEL[type(msg)]]
    return schema.to_bytes({"msg": ("c1", msg.to_tree())})


def rrc_unpack(raw: bytes, channel: str):
    """Decode the PER message delivered on `channel`; returns the dataclass
    (or (kind, tree) for message kinds no dataclass models)."""
    schema, types = CHANNELS[channel]
    v = schema.unpack(BitReader(raw))
    kind, tree = v["msg"][1]
    cls = types.get(kind)
    return cls.from_tree(tree) if cls else (kind, tree)

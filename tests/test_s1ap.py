"""S1AP ALIGNED-PER codec vs the reference's committed byte vectors.

Vectors from lib/test/asn1/s1ap_test.cc and srsenb/test/upper/s1ap_test.cc
(the same buffers the reference's generated codec is tested against); the
semantic assertions mirror the reference TESTASSERTs.
"""

import pytest

from srslte_tpu.s1ap import s1ap_pack, s1ap_unpack

# lib/test/asn1/s1ap_test.cc:101 (test_ue_ctxt_release_req)
UE_CTXT_RELEASE_REQ = bytes.fromhex(
    "00124015000003000000020001000800020001000240020280")

# lib/test/asn1/s1ap_test.cc:67 (test_init_ctxt_setup_req)
INIT_CTXT_SETUP_REQ = bytes.fromhex(
    "00090080c60000060000000200640008000200010042000a183b9aca00603b9aca0000"
    "18007800003400734500093c0f800a0021f0b7361c5664273e5b04b7020742023e0600"
    "09f107000700375266c101091b0774657374313233066d6e63303730066d6363393031"
    "04677072730501c0a80302270e8080210a0300000a810608080808500bf609f1078001"
    "01f67e72691309f10700012305f4f67e7269006b000518000c00000049002045"
    "25e49a77c8d5cf263363eb5bb9c3439b9eb3861fa8a7cf435407ae422b63b9")

# srsenb/test/upper/s1ap_test.cc:143 (S1SetupResponse from srsepc)
S1_SETUP_RESP = bytes([
    0x20, 0x11, 0x00, 0x25, 0x00, 0x00, 0x03, 0x00, 0x3d, 0x40, 0x0a, 0x03,
    0x80, 0x73, 0x72, 0x73, 0x6d, 0x6d, 0x65, 0x30, 0x31, 0x00, 0x69, 0x00,
    0x0b, 0x00, 0x00, 0x00, 0xf1, 0x10, 0x00, 0x00, 0x01, 0x00, 0x00, 0x1a,
    0x00, 0x57, 0x40, 0x01, 0xff])

# srsenb/test/upper/s1ap_test.cc:174 (InitialContextSetupRequest)
ICSR_SMALL = bytes([
    0x00, 0x09, 0x00, 0x80, 0xac, 0x00, 0x00, 0x06, 0x00, 0x00, 0x00, 0x02,
    0x00, 0x01, 0x00, 0x08, 0x00, 0x02, 0x00, 0x01, 0x00, 0x42, 0x00, 0x0a,
    0x18, 0x3b, 0x9a, 0xca, 0x00, 0x60, 0x3b, 0x9a, 0xca, 0x00, 0x00, 0x18,
    0x00, 0x5e, 0x00, 0x00, 0x34, 0x00, 0x59, 0x45, 0x00, 0x09, 0x3c, 0x0f,
    0x80, 0x7f, 0x00, 0x01, 0x64, 0x00, 0x00, 0x00, 0x01, 0x4a, 0x27, 0x9b,
    0x6d, 0xe9, 0x42, 0x01, 0x07, 0x42, 0x01, 0x3e, 0x06, 0x00, 0x00, 0xf1,
    0x10, 0x00, 0x07, 0x00, 0x1d, 0x52, 0x01, 0xc1, 0x01, 0x09, 0x07, 0x06,
    0x73, 0x72, 0x73, 0x61, 0x70, 0x6e, 0x05, 0x01, 0xc0, 0xa8, 0x0a, 0x02,
    0x27, 0x08, 0x80, 0x00, 0x0d, 0x04, 0x08, 0x08, 0x08, 0x08, 0x50, 0x0b,
    0xf6, 0x00, 0xf1, 0x10, 0x00, 0x01, 0x1a, 0x32, 0xdd, 0x59, 0x35, 0x13,
    0x00, 0xf1, 0x10, 0x00, 0x01, 0x23, 0x05, 0xf4, 0x32, 0xdd, 0x59, 0x35,
    0x00, 0x6b, 0x00, 0x05, 0x18, 0x00, 0x0c, 0x00, 0x00, 0x00, 0x49, 0x00,
    0x20, 0x84, 0xa4, 0xea, 0x15, 0x55, 0xb3, 0xe0, 0xf4, 0x55, 0xbe, 0x1f,
    0x41, 0x52, 0x92, 0xfc, 0x04, 0xd8, 0x02, 0x38, 0x0d, 0xe0, 0x81, 0x29,
    0xe1, 0xaa, 0xd7, 0xc4, 0x7b, 0x12, 0x95, 0x72, 0xbe])

# srsenb/test/upper/s1ap_test.cc:195 (InitialContextSetupResponse)
ICS_RESP = bytes([
    0x20, 0x09, 0x00, 0x22, 0x00, 0x00, 0x03, 0x00, 0x00, 0x40, 0x02, 0x00,
    0x01, 0x00, 0x08, 0x40, 0x02, 0x00, 0x01, 0x00, 0x33, 0x40, 0x0f, 0x00,
    0x00, 0x32, 0x40, 0x0a, 0x0a, 0x1f, 0x7f, 0x00, 0x01, 0x01, 0x00, 0x00,
    0x00, 0x01])

ALL = {
    "ue_ctxt_release_req": UE_CTXT_RELEASE_REQ,
    "init_ctxt_setup_req": INIT_CTXT_SETUP_REQ,
    "s1_setup_resp": S1_SETUP_RESP,
    "icsr_small": ICSR_SMALL,
    "ics_resp": ICS_RESP,
}


@pytest.mark.parametrize("name", sorted(ALL))
def test_reference_vector_roundtrip(name):
    raw = ALL[name]
    proc, ies = s1ap_unpack(raw)
    assert s1ap_pack(proc, ies) == raw


def test_ue_ctxt_release_req_semantics():
    proc, ies = s1ap_unpack(UE_CTXT_RELEASE_REQ)
    assert proc == "ue_context_release_request"
    assert ies["mme_ue_id"] == 1 and ies["enb_ue_id"] == 1
    assert ies["cause"] == ("radio_network", "user_inactivity")


def test_init_ctxt_setup_req_semantics():
    """Mirror of lib/test/asn1/s1ap_test.cc TESTASSERTs."""
    proc, ies = s1ap_unpack(INIT_CTXT_SETUP_REQ)
    assert proc == "initial_context_setup_request"
    caps = ies["ue_security_capabilities"]
    assert caps["eea"] == 0b1100000000000000
    assert caps["eia"] == 0b1100000000000000
    assert ies["ue_aggregate_max_bitrate"] == {"dl": 10**9, "ul": 10**9}
    item = ies["erab_to_be_setup_list"][0]["item"]
    assert item["erab_id"] == 5
    assert item["qos"]["qci"] == 9
    assert item["gtp_teid"] == bytes.fromhex("b7361c56")


def test_icsr_small_semantics():
    proc, ies = s1ap_unpack(ICSR_SMALL)
    item = ies["erab_to_be_setup_list"][0]["item"]
    # transportLayerAddress 127.0.0.100/32, GTP TEID 1
    assert item["transport_address"] == (0x7f000164, 32)
    assert item["gtp_teid"] == bytes([0, 0, 0, 1])
    assert ies["security_key"] is not None


def test_s1_setup_resp_semantics():
    proc, ies = s1ap_unpack(S1_SETUP_RESP)
    assert proc == "s1_setup_response"
    assert ies["mme_name"] == "srsmme01"
    g = ies["served_gummeis"][0]
    assert g["plmns"] == [bytes.fromhex("00f110")]
    assert g["group_ids"] == [bytes.fromhex("0100")]
    assert g["mmecs"] == [bytes([0x1a])]
    assert ies["relative_mme_capacity"] == 0xFF


def test_ics_resp_semantics():
    proc, ies = s1ap_unpack(ICS_RESP)
    assert proc == "initial_context_setup_response"
    item = ies["erab_setup_list"][0]["item"]
    assert item["erab_id"] == 5
    assert item["transport_address"] == (0x7f000101, 32)


def test_pack_attach_path_messages():
    """Round-trip every procedure the live S1 path uses (no vectors)."""
    cases = {
        "s1_setup_request": {
            "global_enb_id": {"plmn": b"\x00\xf1\x10",
                              "enb_id": ("macro", 0x19B)},
            "enb_name": "srsenb01",
            "supported_tas": [{"tac": b"\x00\x07",
                               "plmns": [b"\x00\xf1\x10"]}],
            "default_paging_drx": "v128"},
        "initial_ue_message": {
            "enb_ue_id": 1, "nas_pdu": b"\x07\x41\x01",
            "tai": {"plmn": b"\x00\xf1\x10", "tac": b"\x00\x07"},
            "eutran_cgi": {"plmn": b"\x00\xf1\x10", "cell_id": 0x19B01},
            "establishment_cause": "mo_signalling"},
        "downlink_nas_transport": {
            "mme_ue_id": 7, "enb_ue_id": 1, "nas_pdu": b"\x07\x52\x00"},
        "uplink_nas_transport": {
            "mme_ue_id": 7, "enb_ue_id": 1, "nas_pdu": b"\x07\x53",
            "eutran_cgi": {"plmn": b"\x00\xf1\x10", "cell_id": 0x19B01},
            "tai": {"plmn": b"\x00\xf1\x10", "tac": b"\x00\x07"}},
        "ue_context_release_command": {
            "ue_s1ap_ids": ("pair", {"mme_ue_id": 7, "enb_ue_id": 1}),
            "cause": ("nas", "detach")},
        "ue_context_release_complete": {"mme_ue_id": 7, "enb_ue_id": 1},
        "enb_status_transfer": {
            "mme_ue_id": 7, "enb_ue_id": 1,
            "container": {"bearers": [{"item": {
                "erab_id": 5,
                "ul_count": {"pdcp_sn": 4, "hfn": 0},
                "dl_count": {"pdcp_sn": 5, "hfn": 0}}}]}},
    }
    for proc, ies in cases.items():
        raw = s1ap_pack(proc, ies)
        proc2, ies2 = s1ap_unpack(raw)
        assert proc2 == proc
        assert ies2 == ies, proc

"""ASN.1 UNALIGNED PER codec vs the reference's committed test vectors.

External-oracle parity: every vector below is byte-for-byte from the
reference's generated-codec tests (lib/test/asn1/srsran_asn1_rrc_*_test.cc)
or from the off-air capture signal.1.92M.amar.dat (SIB payloads decoded by
tests/test_reference_captures.py).  Expected field values were produced by
running the reference's own generated codec (lib/src/asn1/rrc/*.cc compiled
standalone) on the same bytes, so agreement here proves 36.331 wire-format
interoperability, not self-consistency.
"""

from srslte_tpu.rrc.asn1_rrc import (BCCH_DL_SCH_MESSAGE, DL_CCCH_MESSAGE,
                                     DL_DCCH_MESSAGE, UL_CCCH_MESSAGE,
                                     UL_DCCH_MESSAGE)
from srslte_tpu.rrc.per import BitReader

# lib/test/asn1/srsran_asn1_rrc_dl_dcch_test.cc:39 (rrc_conn_reconfig_ho_test1)
HO_RECONFIG_HEX = (
    "201b3f8000000001a908800000290097800000000104221400f8020ac06000a0"
    "0c8042029f4307dabcf84b321834c0002d68085e1800168000")
# lib/test/asn1/srsran_asn1_rrc_meas_test.cc:41 (meas_obj_test)
MEAS_REPORT_HEX = "0810493c0d978983c084208208210001bc48"
# lib/test/asn1/srsran_asn1_rrc_dl_ccch_test.cc:39 (rrc_conn_setup_test1)
CONN_SETUP_HEX = "6012980bfdd204fa183ed5e6c25990c1a60001314042508000f8"
# off-air SIB1/SI payloads from signal.1.92M.amar.dat (test_reference_captures)
SIB1_HEX = "6040040300011a2d4018028180420c800000"
SIB23_HEX = "00800c61bc8ca883d601ba01000408019739dcb2d5425c700308518b613a9690"


def _roundtrip(schema, hexs):
    data = bytes.fromhex(hexs)
    r = BitReader(data)
    v = schema.unpack(r)
    enc = schema.to_bytes(v)
    nbytes = (r.pos + 7) // 8
    assert enc[:nbytes] == data[:nbytes], (
        f"re-encode mismatch:\n  mine {enc.hex()}\n  ref  {hexs}")
    return v


def test_ho_reconfiguration_vector():
    v = _roundtrip(DL_DCCH_MESSAGE, HO_RECONFIG_HEX)
    kind, msg = v["msg"][1]
    assert kind == "rrc_conn_recfg"
    assert msg["rrc_transaction_id"] == 0
    r8 = msg["crit_exts"][1][1]
    # mobilityControlInfo (reference to_json: targetPhysCellId 272,
    # t304 ms1000, newUE-Identity 0x003e, sameSFN-Indication-r14 ext present)
    mci = r8["mob_ctrl_info"]
    assert mci["target_pci"] == 272
    assert mci["t304"] == "ms1000"
    assert mci["new_ue_id"] == 0x003E
    assert mci["_ext"] is not None  # sameSFN-Indication-r14 addition group
    rrcc = mci["rr_cfg_common"]
    assert rrcc["prach_cfg"] == {"root_seq_idx": 86}
    assert rrcc["p_max"] == 10
    assert rrcc["pusch_cfg_common"]["pusch_cfg_basic"]["pusch_hop_offset"] == 12
    # measConfig
    mc = r8["meas_cfg"]
    assert mc["meas_obj_to_rem_list"] == [1]
    obj = mc["meas_obj_to_add_mod_list"][0]
    assert obj["meas_obj_id"] == 1
    assert obj["meas_obj"][1]["carrier_freq"] == 3400
    assert obj["meas_obj"][1]["allowed_meas_bw"] == "mbw25"
    rep = mc["report_cfg_to_add_mod_list"][0]["report_cfg"][1]
    ev = rep["trigger_type"][1]
    assert ev["event_id"][0] == "event_a3"
    assert ev["event_id"][1]["a3_offset"] == 6
    assert ev["time_to_trigger"] == "ms480"
    assert rep["report_interv"] == "ms120"
    assert mc["meas_id_to_add_mod_list"] == [
        {"meas_id": 1, "meas_obj_id": 1, "report_cfg_id": 1}]
    # securityConfigHO
    ho = r8["security_cfg_ho"]["ho_type"]
    assert ho[0] == "intra_lte"
    assert ho[1]["key_change_ind"] is False
    assert ho[1]["next_hop_chaining_count"] == 0
    # radioResourceConfigDedicated
    rrd = r8["rr_cfg_ded"]
    mac = rrd["mac_main_cfg"][1]
    assert mac["ul_sch_cfg"]["max_harq_tx"] == "n5"
    assert mac["time_align_timer_ded"] == "infinity"
    phys = rrd["phys_cfg_ded"]
    assert phys["ant_info"] == ("default_value", None)
    cqi = phys["cqi_report_cfg"]["cqi_report_periodic"][1]
    assert cqi["cqi_pmi_cfg_idx"] == 45
    srs = phys["srs_ul_cfg_ded"][1]
    assert srs["srs_cfg_idx"] == 47 and srs["srs_bw"] == "bw1"
    sr = phys["sched_request_cfg"][1]
    assert sr["sr_cfg_idx"] == 22 and sr["dsr_trans_max"] == "n64"


def test_measurement_report_vector():
    v = _roundtrip(UL_DCCH_MESSAGE, MEAS_REPORT_HEX)
    kind, msg = v["msg"][1]
    assert kind == "meas_report"
    meas = msg["crit_exts"][1][1]["meas_results"]
    assert meas["meas_id"] == 1
    assert meas["meas_result_pcell"] == {"rsrp_result": 73, "rsrq_result": 15}
    lst = meas["meas_result_neigh_cells"][1]
    assert len(lst) == 1
    n = lst[0]
    assert n["pci"] == 357
    cgi = n["cgi_info"]
    # reference asserts plmn "89878", cell_id 0x1084104, tac 0x1042
    assert cgi["cell_global_id"]["plmn_id"] == {"mcc": [8, 9, 8], "mnc": [7, 8]}
    assert cgi["cell_global_id"]["cell_id"] == 0x1084104
    assert cgi["tac"] == 0x1042
    assert len(cgi["plmn_id_list"]) == 1
    assert "mcc" not in cgi["plmn_id_list"][0]
    assert n["meas_result"] == {"rsrp_result": 60, "rsrq_result": 18}


def test_connection_setup_vector():
    v = _roundtrip(DL_CCCH_MESSAGE, CONN_SETUP_HEX)
    kind, msg = v["msg"][1]
    assert kind == "rrc_conn_setup"
    r8 = msg["crit_exts"][1][1]
    phys = r8["rr_cfg_ded"]["phys_cfg_ded"]
    cqi_cfg = phys["cqi_report_cfg"]
    assert cqi_cfg["nom_pdsch_rs_epre_offset"] == 0
    cqi = cqi_cfg["cqi_report_periodic"][1]
    assert cqi["cqi_pucch_res_idx"] == 0
    assert cqi["cqi_pmi_cfg_idx"] == 38


def test_offair_sib1():
    v = _roundtrip(BCCH_DL_SCH_MESSAGE, SIB1_HEX)
    kind, sib1 = v["msg"][1]
    assert kind == "sib_type1"
    cell = sib1["cell_access_related_info"]
    assert cell["plmn_id_list"][0]["plmn_id"] == {"mcc": [0, 0, 1],
                                                 "mnc": [0, 1]}
    assert cell["tac"] == 1
    assert cell["cell_id"] == 0x1A2D401  # "0001101000101101010000000001"
    assert cell["cell_barred"] == "not_barred"
    assert sib1["cell_sel_info"]["q_rx_lev_min"] == -70
    assert sib1["p_max"] == 10
    assert sib1["freq_band_ind"] == 7
    sched = sib1["sched_info_list"][0]
    assert sched["si_periodicity"] == "rf16"
    assert sched["sib_map_info"] == ["sib_type3"]
    assert sib1["si_win_len"] == "ms40"
    assert sib1["sys_info_value_tag"] == 8


def test_offair_sib2_sib3():
    v = _roundtrip(BCCH_DL_SCH_MESSAGE, SIB23_HEX)
    kind, si = v["msg"][1]
    assert kind == "sys_info"
    sibs = si["crit_exts"][1]["sib_type_and_info"]
    assert [s[0] for s in sibs] == ["sib2", "sib3"]
    sib2 = sibs[0][1]
    rr = sib2["rr_cfg_common"]
    rach = rr["rach_cfg_common"]
    assert rach["preamb_info"]["nof_ra_preambs"] == "n52"
    assert rach["pwr_ramp_params"]["preamb_init_rx_target_pwr"] == "dBm_104"
    assert rach["ra_supervision_info"]["preamb_trans_max"] == "n10"
    assert rach["max_harq_msg3_tx"] == 5
    assert rr["prach_cfg"]["root_seq_idx"] == 648
    assert rr["prach_cfg"]["prach_cfg_info"]["prach_cfg_idx"] == 15
    assert rr["prach_cfg"]["prach_cfg_info"]["zero_correlation_zone_cfg"] == 11
    assert rr["pdsch_cfg_common"] == {"ref_sig_pwr": -5, "p_b": 1}
    assert rr["pucch_cfg_common"]["delta_pucch_shift"] == "ds2"
    assert rr["pucch_cfg_common"]["n1_pucch_an"] == 12
    assert rr["srs_ul_cfg_common"][1]["srs_bw_cfg"] == "bw7"
    up = rr["ul_pwr_ctrl_common"]
    assert up["p0_nominal_pusch"] == -67 and up["alpha"] == "al07"
    assert up["p0_nominal_pucch"] == -105 and up["delta_preamb_msg3"] == 4
    t = sib2["ue_timers_and_consts"]
    assert t["t300"] == "ms200" and t["t311"] == "ms10000"
    assert t["n310"] == "n6" and t["n311"] == "n5"
    assert sib2["freq_info"]["add_spec_emission"] == 1
    assert sib2["time_align_timer_common"] == "sf1920"
    sib3 = sibs[1][1]
    assert sib3["cell_resel_info_common"]["q_hyst"] == "dB2"
    f = sib3["cell_resel_serving_freq_info"]
    assert f == {"s_non_intra_search": 3, "thresh_serving_low": 2,
                 "cell_resel_prio": 6}
    intra = sib3["intra_freq_cell_resel_info"]
    assert intra["q_rx_lev_min"] == -61 and intra["p_max"] == 23
    assert intra["s_intra_search"] == 5 and intra["t_resel_eutra"] == 1
    assert intra["presence_ant_port1"] is True


def test_local_roundtrips():
    """Messages our stack originates must round-trip through the PER wire."""
    req = {"msg": ("c1", ("rrc_conn_request", {"crit_exts": (
        "rrc_conn_request_r8",
        {"ue_id": ("random_value", 0x123456789A),
         "establishment_cause": "mo_sig", "spare": 0})}))}
    enc = UL_CCCH_MESSAGE.to_bytes(req)
    assert len(enc) == 6  # 1+40+3+1+... = 46 bits -> 6 bytes, fits msg3
    r = BitReader(enc)
    assert UL_CCCH_MESSAGE.unpack(r) == req

    smc = {"msg": ("c1", ("security_mode_cmd", {
        "rrc_transaction_id": 1,
        "crit_exts": ("c1", ("security_mode_cmd_r8", {
            "security_cfg_smc": {"security_algorithm_cfg": {
                "ciphering_algorithm": "eea2",
                "integrity_prot_algorithm": "eia2"}},
        }))}))}
    enc = DL_DCCH_MESSAGE.to_bytes(smc)
    r = BitReader(enc)
    assert DL_DCCH_MESSAGE.unpack(r) == smc

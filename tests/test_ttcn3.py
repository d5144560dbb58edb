"""TTCN3 SS interface: a fake tester drives the unmodified UE stack
through the UT/SYS/SRB JSON-over-TCP ports to a completed RRC setup.

Reference behavior: srsue/test/ttcn3/ — ttcn3_{ut,sys,srb}_interface.h
message shapes; the SS wraps the real stack with an ideal PHY.
"""

import numpy as np

from srslte_tpu.phy.common.params import Cell
from srslte_tpu.rrc.messages import (ConnectionRequest, ConnectionSetup,
                                     ConnectionSetupComplete, rrc_pack,
                                     rrc_unpack)
from srslte_tpu.ttcn3 import JsonPort, SystemSimulator, srb_msg
from srslte_tpu.ue import UeApp
from srslte_tpu.ue_stack import SoftUsim, UeNas


def _mk_ss_and_tester():
    servers = [JsonPort.listen() for _ in range(3)]
    ports = [s.getsockname()[1] for s in servers]
    testers = [JsonPort.connect("127.0.0.1", p) for p in ports]
    ss_ports = [JsonPort.accept(s) for s in servers]
    cell = Cell(n_prb=25, id=1)
    usim = SoftUsim(imsi="001010123456789", key=bytes(range(16)),
                    opc=bytes(range(16, 32)))
    ue = UeApp(cell, UeNas(usim))
    ss = SystemSimulator(ue, ut=ss_ports[0], sys=ss_ports[1],
                         srb=ss_ports[2])
    return ss, testers, servers


def test_ss_attach_over_json_ports():
    ss, (ut, sys_p, srb), servers = _mk_ss_and_tester()
    try:
        # SYS: configure the cell
        sys_p.send({"Common": {"CellId": "eutra_Cell1"},
                    "Request": {"Cell": {"AddOrReconfigure": {
                        "PhysicalCellId": 1, "Earfcn": 3400}}}})
        ss.handle_sys()
        assert sys_p.recv()["Confirm"]["Cell"] is True

        # SYS: timing enquiry
        sys_p.send({"Request": {"EnquireTiming": True}})
        ss.handle_sys()
        t = sys_p.recv()
        assert "Time" in t and t["Confirm"]["EnquireTiming"] is True

        # UT: switch on -> the UE's own RA FSM emits msg3 with the CCCH SDU
        ut.send({"Cmd": {"MMI": {"Cmd": "SWITCH_ON"}}, "CnfRequired": True})
        ss.handle_ut()
        assert ut.recv()["Cnf"]["MMI"]["Result"] is True

        up = srb.recv()  # SS forwarded the UL CCCH message
        assert up["Common"]["RoutingInfo"]["RadioBearerId"]["Srb"] == 0
        req = rrc_unpack(bytes.fromhex(up["RrcPdu"]["Ccch"]), "ul_ccch")
        assert isinstance(req, ConnectionRequest)

        # tester answers with ConnectionSetup on SRB0 (+ msg4 con-res)
        srb.send(srb_msg("eutra_Cell1", 0, "Ccch",
                         rrc_pack(ConnectionSetup())))
        ss.handle_srb()

        up = srb.recv()  # SetupComplete (with the NAS attach) on SRB1
        assert up["Common"]["RoutingInfo"]["RadioBearerId"]["Srb"] == 1
        msg = rrc_unpack(bytes.fromhex(up["RrcPdu"]["Dcch"]), "ul_dcch")
        assert isinstance(msg, ConnectionSetupComplete)
        assert len(msg.nas_pdu) > 4  # carries the NAS ATTACH REQUEST
        assert ss.ue.state == "connected"
        assert ss.ue.rrc_state == "connected"
    finally:
        for p in (ut, sys_p, srb):
            p.close()
        for s in servers:
            s.close()

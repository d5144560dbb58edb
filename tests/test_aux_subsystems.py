"""Auxiliary subsystems: NAS/RLC/S1AP PCAP writers, EARFCN band helper,
eNB structured events, MBMS-GW data path.

Reference behavior: lib/src/common/{pcap.c, nas_pcap.cc, rlc_pcap.cc,
s1ap_pcap.cc, enb_events.cc}, lib/src/phy/common/phy_common.c band table,
srsepc/src/mbms-gw/mbms-gw.cc.
"""

import json
import struct

import numpy as np
import pytest


def _read_pcap(path):
    data = open(path, "rb").read()
    magic, _, _, _, _, _, dlt = struct.unpack("<IHHiIII", data[:24])
    assert magic == 0xA1B2C3D4
    pkts, off = [], 24
    while off < len(data):
        _, _, incl, _ = struct.unpack("<IIII", data[off : off + 16])
        pkts.append(data[off + 16 : off + 16 + incl])
        off += 16 + incl
    return dlt, pkts


def test_nas_s1ap_pcap_raw_dlt(tmp_path):
    from srslte_tpu.utils.pcap import NasPcap, S1apPcap

    p = tmp_path / "nas.pcap"
    w = NasPcap(str(p))
    w.write_pdu(b"\x07\x41\x01")  # attach request header bytes
    w.write_pdu(b"\x07\x42")
    w.close()
    dlt, pkts = _read_pcap(p)
    assert dlt == 148 and pkts == [b"\x07\x41\x01", b"\x07\x42"]

    p2 = tmp_path / "s1ap.pcap"
    w = S1apPcap(str(p2))
    w.write_pdu(b"\x00\x11\x22")
    w.close()
    dlt, pkts = _read_pcap(p2)
    assert dlt == 150 and pkts == [b"\x00\x11\x22"]


def test_rlc_pcap_framing(tmp_path):
    from srslte_tpu.utils.pcap import RLC_AM_MODE, RLC_UM_MODE, RlcPcap

    p = tmp_path / "rlc.pcap"
    w = RlcPcap(str(p), ue_id=7)
    w.write_pdu(b"\x88\x00payload", mode=RLC_AM_MODE, lcid=1)
    w.write_pdu(b"\x99", mode=RLC_UM_MODE, lcid=3, is_srb=False)
    w.close()
    dlt, pkts = _read_pcap(p)
    assert dlt == 149
    # dummy UDP header then the rlc-lte magic
    assert pkts[0][:2] == b"\xde\xad" and pkts[0][8:15] == b"rlc-lte"
    assert pkts[0][15] == RLC_AM_MODE
    assert pkts[0].endswith(b"\x88\x00payload")
    assert pkts[1][15] == RLC_UM_MODE
    # UM carries the SN-length tag right after the mode byte
    assert pkts[1][16] == 0x02


def test_band_helper():
    from srslte_tpu.phy.common.band import (band_from_dl_earfcn, band_is_tdd,
                                            dl_freq_hz, ul_earfcn_from_dl,
                                            ul_freq_hz)

    # band 3: F_DL = 1805 + 0.1*(1275-1200) = 1812.5 MHz
    assert band_from_dl_earfcn(1275) == 3
    assert dl_freq_hz(1275) == pytest.approx(1812.5e6)
    # paired UL: N_UL = N_DL - 1200 + 19200 -> F_UL = F_DL - 95 MHz
    assert ul_earfcn_from_dl(1275) == 19275
    assert ul_freq_hz(19275) == pytest.approx(1812.5e6 - 95e6)
    # band 1 EARFCN 300: 2110 + 30 = 2140 MHz
    assert dl_freq_hz(300) == pytest.approx(2140e6)
    # band 38 is TDD
    assert band_is_tdd(38)
    assert not band_is_tdd(7)


def test_enb_event_log(tmp_path):
    from srslte_tpu.utils.events import EventLog

    path = tmp_path / "events.json"
    ev = EventLog(str(path))
    ev.sector_start(0, 101, 1)
    ev.rrc_event(0, 0x46, "connected")
    ev.measurement_report(0, 0x46)
    ev.rrc_event(0, 0x46, "handover")
    ev.rlf(0, 0x47)
    ev.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["event_name"] for l in lines] == [
        "sector_start", "rrc_connected", "measurement_report",
        "rrc_handover", "rlf_report"]
    assert all(l["type"] == "event" for l in lines)
    assert len(ev.of_kind("rrc_connected")) == 1


def test_enb_emits_sector_events_on_init():
    """The live eNB wires the event log: one sector_start per cell."""
    pytest.importorskip("jax")
    from srslte_tpu.enb import EnbApp
    from srslte_tpu.phy.common.params import Cell

    enb = EnbApp([Cell(n_prb=6, id=1), Cell(n_prb=6, id=2)])
    starts = enb.events.of_kind("sector_start")
    assert len(starts) == 2
    assert {e["pci"] for e in starts} == {1, 2}


def test_mbms_gw_data_path():
    from srslte_tpu.epc.mbms_gw import EnbM1uRx, MbmsGw

    rx = EnbM1uRx(port=23452)
    gw = MbmsGw(m1u_port=23452)
    pkts = [bytes([0x45, 0, 0, 20 + i]) + bytes(16 + i) for i in range(3)]
    for p in pkts:
        gw.sgi_mb_rx(p)
    import time

    got = []
    for _ in range(20):
        got.extend(rx.poll())
        if len(got) == 3:
            break
        time.sleep(0.02)
    assert got == pkts
    assert gw.pkts_tx == 3
    gw.close()
    rx.close()


def test_zmq_rf_wire_protocol():
    """REQ/REP CF32 burst exchange, the rf_zmq_imp wire protocol."""
    pytest.importorskip("zmq")
    import threading

    import numpy as np

    from srslte_tpu.net.zmq_rf import ZmqRxClient, ZmqTxServer

    srv = ZmqTxServer(bind="tcp://127.0.0.1:23979")
    cli = ZmqRxClient(connect="tcp://127.0.0.1:23979")
    rng = np.random.default_rng(0)
    burst = (rng.standard_normal(1920)
             + 1j * rng.standard_normal(1920)).astype(np.complex64)
    t = threading.Thread(target=lambda: srv.serve_once(burst))
    t.start()
    got = cli.recv()
    t.join()
    assert got is not None and np.array_equal(got, burst)
    srv.close()
    cli.close()


def test_crash_handler(tmp_path):
    """Crash diagnostics file (crash_handler.cc analog): armed banner on
    install, uncaught-exception backtrace appended via the excepthook."""
    import sys

    from srslte_tpu.utils import crash

    path = str(tmp_path / "bt.crash")
    crash.install(path)
    try:
        try:
            raise RuntimeError("boom-for-test")
        except RuntimeError:
            sys.excepthook(*sys.exc_info())
        text = open(path).read()
        assert "crash handler armed" in text and "pid=" in text
        assert "uncaught exception" in text and "boom-for-test" in text
    finally:
        crash.uninstall()


def test_tprof_percentile_probes():
    """time_prof.h analog: gated probes with percentile stats."""
    import time as _time

    from srslte_tpu.utils import tprof

    tprof.reset_all()
    tprof.set_enabled(False)
    with tprof.probe("disabled")():
        pass
    assert tprof.probe("disabled").count == 0  # gate really gates

    tprof.set_enabled(True)
    try:
        p = tprof.probe("work")
        for i in range(20):
            with p():
                _time.sleep(0.0005 * (1 + (i % 3)))
        s = p.stats()
        assert s["count"] == 20
        assert s["min_us"] >= 400
        assert s["p99_us"] >= s["p50_us"] >= s["min_us"]
        assert s["max_us"] >= s["p99_us"]
        out = p.measure(lambda a, b: a + b, 2, 3)
        assert out == 5 and p.count == 21
        rep = tprof.report_all()
        assert [r["name"] for r in rep] == ["work"]
    finally:
        tprof.set_enabled(False)
        tprof.reset_all()


def test_sys_metrics_producer():
    """sys_metrics_processor analog feeding the metrics hub."""
    from srslte_tpu.utils.metrics import MetricsHub
    from srslte_tpu.utils.sysmetrics import SysMetrics

    sm = SysMetrics()
    first = sm.get_metrics()
    assert first["proc_rss_mb"] > 1.0
    assert first["threads"] >= 1
    # burn a little CPU so the delta-based percentage is visible
    x = 0
    for i in range(2 * 10**6):
        x += i
    second = sm.get_metrics()
    assert second["cpu_percent"] > 0.0
    assert second["sys_mem_free_mb"] > 0.0

    hub = MetricsHub()
    hub.add_producer("sys", sm.get_metrics)
    snap = hub.poll_once()
    assert "cpu_percent" in snap["sys"]


def test_mac_pcap_net_live_export():
    """mac_pcap_net.cc analog: framed MAC PDUs over a live UDP socket."""
    import socket

    from srslte_tpu.utils.pcap import MAC_LTE_START, MacPcap, MacPcapNet

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(2.0)
    port = rx.getsockname()[1]
    net = MacPcapNet(port=port, ue_id=7)
    net.write_pdu(b"\x3f\x01\x02", rnti=0x46, tti=13, direction=1)
    dgram = rx.recv(2048)
    net.close()
    rx.close()
    assert dgram.startswith(MAC_LTE_START)
    assert dgram.endswith(b"\x3f\x01\x02")
    # identical framing bytes as the file writer's payload path
    import struct as _s
    assert _s.pack("!H", 0x46) in dgram  # RNTI tag value


def test_nr_band_helper():
    """band_helper.cc NR raster + band lookup."""
    from srslte_tpu.phy.common.band import (freq_to_nr_arfcn, get_bands_nr,
                                            nr_arfcn_to_freq)

    # raster segment boundaries (38.104 table 5.4.2.1-1)
    assert nr_arfcn_to_freq(422000) == 2110e6  # n1 DL start, 5 kHz raster
    assert nr_arfcn_to_freq(632628) == 3489.42e6  # common n78 SSB region
    assert nr_arfcn_to_freq(600000) == 3000e6
    # round trips
    for arfcn in (123400, 422020, 632628, 2016667):
        assert freq_to_nr_arfcn(nr_arfcn_to_freq(arfcn)) == arfcn
    # band lookup incl. overlapping bands and the raster-step gate
    assert 78 in get_bands_nr(632628) and 77 in get_bands_nr(632628)
    assert set(get_bands_nr(422000)) >= {1, 66}
    assert 41 in get_bands_nr(499203)  # step 3
    assert 41 not in get_bands_nr(499202)
    import pytest as _p
    with _p.raises(ValueError):
        nr_arfcn_to_freq(4000000)

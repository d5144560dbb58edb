"""Utility subsystem tests: tracing, metrics hub, config, pcap."""

import json
import struct

from srslte_tpu.utils.config import Config
from srslte_tpu.utils.metrics import CsvListener, JsonLinesListener, MetricsHub
from srslte_tpu.utils.pcap import MacPcap
from srslte_tpu.utils.trace import Tracer


def test_tracer_chrome_format(tmp_path):
    t = Tracer(enabled=True)
    with t.span("phy", "decode_subframe", tti=4):
        t.instant("phy", "crc_ok")
    p = str(tmp_path / "trace.json")
    t.save(p)
    data = json.load(open(p))
    evs = data["traceEvents"]
    assert any(e["ph"] == "X" and e["name"] == "decode_subframe" for e in evs)
    assert any(e["ph"] == "i" and e["name"] == "crc_ok" for e in evs)


def test_tracer_disabled_is_free():
    t = Tracer(enabled=False)
    with t.span("a", "b"):
        pass
    assert t.events == []


def test_metrics_hub_fanout(tmp_path):
    hub = MetricsHub(period_s=100)
    hub.add_producer("phy", lambda: {"bler": 0.01, "snr_db": 21.5})
    hub.add_producer("mac", lambda: {"tx_pkts": 5})
    csv_p = str(tmp_path / "m.csv")
    jl_p = str(tmp_path / "m.jsonl")
    c = CsvListener(csv_p, ["phy.bler", "mac.tx_pkts"])
    j = JsonLinesListener(jl_p)
    hub.add_listener(c)
    hub.add_listener(j)
    snap = hub.poll_once()
    assert snap["phy"]["snr_db"] == 21.5
    c.close(), j.close()
    rows = open(csv_p).read().strip().split("\n")
    assert rows[0] == "phy.bler,mac.tx_pkts"
    assert rows[1] == "0.01,5"
    line = json.loads(open(jl_p).read())
    assert line["mac"]["tx_pkts"] == 5


def test_metrics_hub_broken_producer():
    hub = MetricsHub()
    hub.add_producer("bad", lambda: 1 / 0)
    snap = hub.poll_once()
    assert "error" in snap["bad"]


def test_config_file_and_cli(tmp_path):
    p = tmp_path / "ue.conf"
    p.write_text("[rf]\nsrate = 23040000\n[phy]\nnof_threads = 3\n")
    cfg = Config()
    cfg.declare("rf.srate", 1920000)
    cfg.declare("phy.nof_threads", 1)
    cfg.declare("phy.snr_ema", 0.1)
    cfg.declare("log.enable", False)
    cfg.load_file(str(p))
    rest = cfg.load_args(["--phy.nof_threads=4", "--log.enable=true", "pos"])
    assert rest == ["pos"]
    assert cfg.get("rf.srate") == 23040000
    assert cfg.get("phy.nof_threads") == 4
    assert cfg.get("phy.snr_ema") == 0.1
    assert cfg.get("log.enable") is True


def test_mac_pcap_writes_valid_file(tmp_path):
    p = str(tmp_path / "mac.pcap")
    pc = MacPcap(p)
    pc.write_pdu(b"\x3f\x01\x02\x03", rnti=0x46, tti=3)
    pc.close()
    raw = open(p, "rb").read()
    magic, = struct.unpack("<I", raw[:4])
    assert magic == 0xA1B2C3D4
    assert b"mac-lte" in raw


def test_metrics_stdout_table():
    """metrics_stdout.cc analog: header cadence + formatted rows."""
    import io

    from srslte_tpu.utils.metrics import MetricsHub, StdoutTableListener

    buf = io.StringIO()
    hub = MetricsHub(period_s=0.01)
    state = {"snr": 21.4567, "mcs": 27}
    hub.add_producer("phy", lambda: dict(state))
    hub.add_listener(StdoutTableListener(
        [("snr", "phy.snr"), ("mcs", "phy.mcs"), ("bler", "phy.bler")],
        header_every=2, out=buf))
    for _ in range(4):
        hub.poll_once()
    lines = [l for l in buf.getvalue().splitlines() if l]
    # 2 headers + 4 rows
    assert len(lines) == 6
    assert lines[0].split() == ["snr", "mcs", "bler"]
    assert lines[1].split() == ["21.5", "27", "-"]  # 3 sig digits, missing=-
    assert lines[3] == lines[0]

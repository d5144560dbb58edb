"""RRC measurement events (36.331 §5.5.4) — analog of rrc_meas test logic."""

import numpy as np

from srslte_tpu.rrc.meas import MeasEventEngine, ReportConfig


def test_a3_hysteresis_and_ttt():
    """A3 fires only after the offset+hysteresis margin holds for TTT."""
    eng = MeasEventEngine(1, ReportConfig("a3", hysteresis_db=1.0,
                                          a3_offset_db=3.0,
                                          time_to_trigger_ms=40))
    # neighbor 2 dB above serving: below offset -> never triggers
    for _ in range(10):
        assert eng.tick(-80.0, {7: -78.0}, 20) is None
    # neighbor 5 dB above: enters, but needs 40 ms
    assert eng.tick(-80.0, {7: -75.0}, 20) is None
    rep = eng.tick(-80.0, {7: -75.0}, 20)
    assert rep is not None and rep.event == "a3" and 7 in rep.triggered
    # no duplicate report while it stays triggered
    assert eng.tick(-80.0, {7: -75.0}, 20) is None
    assert eng.triggered_cells == (7,)
    # falls back below offset - hysteresis for TTT -> leaves
    eng.tick(-80.0, {7: -79.0}, 20)
    eng.tick(-80.0, {7: -79.0}, 20)
    assert eng.triggered_cells == ()


def test_a3_ttt_resets_on_dip():
    eng = MeasEventEngine(2, ReportConfig("a3", time_to_trigger_ms=60))
    eng.tick(-80.0, {3: -70.0}, 40)
    eng.tick(-80.0, {3: -85.0}, 40)  # dip resets the TTT clock
    assert eng.tick(-80.0, {3: -70.0}, 40) is None
    assert eng.tick(-80.0, {3: -70.0}, 40) is not None


def test_a1_a2_serving_events():
    a1 = MeasEventEngine(3, ReportConfig("a1", threshold_dbm=-90.0,
                                         hysteresis_db=2.0))
    assert a1.tick(-89.0, {}, 10) is None  # within hysteresis
    assert a1.tick(-85.0, {}, 10) is not None
    a2 = MeasEventEngine(4, ReportConfig("a2", threshold_dbm=-100.0))
    assert a2.tick(-95.0, {}, 10) is None
    assert a2.tick(-105.0, {}, 10) is not None


def test_a5_dual_threshold():
    eng = MeasEventEngine(5, ReportConfig("a5", threshold1_dbm=-95.0,
                                          threshold2_dbm=-85.0))
    # serving fine -> no event even with strong neighbor
    assert eng.tick(-80.0, {9: -80.0}, 10) is None
    # serving collapsed + neighbor above t2 -> report
    rep = eng.tick(-100.0, {9: -80.0}, 10)
    assert rep is not None and 9 in rep.triggered


def test_a4_multiple_neighbors():
    eng = MeasEventEngine(6, ReportConfig("a4", threshold_dbm=-90.0))
    rep = eng.tick(-80.0, {1: -85.0, 2: -95.0}, 10)
    assert rep is not None and set(rep.triggered) == {1}
    # second neighbor rises later -> its own report
    rep2 = eng.tick(-80.0, {1: -85.0, 2: -85.0}, 10)
    assert rep2 is not None and set(rep2.triggered) == {1, 2}


def test_rrc_paging_and_release_codec():
    from srslte_tpu.rrc.messages import (ConnectionRelease, Paging, rrc_pack,
                                         rrc_unpack)

    p = Paging(records=(0xDEAD0001, 0xBEEF0002))
    out = rrc_unpack(rrc_pack(p), "pcch")
    assert out.records == (0xDEAD0001, 0xBEEF0002)
    assert rrc_unpack(rrc_pack(Paging()), "pcch").records == ()
    r = rrc_unpack(rrc_pack(ConnectionRelease(
        cause="cs_fallback_high_prio_v1020", redirect_earfcn=3400)),
        "dl_dcch")
    assert r.cause == "cs_fallback_high_prio_v1020"
    assert r.redirect_earfcn == 3400

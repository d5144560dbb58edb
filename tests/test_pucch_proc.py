"""PUCCH procedure logic (pucch_proc.c analog): format selection, resource
derivation, FDD channel selection, TDD bundling tables."""

import itertools

import pytest

from srslte_tpu.phy.common.params import CP, Cell
from srslte_tpu.phy.phch.pucch_proc import (ACK, DTX, NACK, AckCfg,
                                            PucchProcCfg, UciUsage, _cs_tx,
                                            cs_get_ack, get_npucch,
                                            get_resources, n_pucch_tdd,
                                            select_format, tdd_select)

CELL = Cell(n_prb=50, id=1, nof_ports=1)
CELL_TDD = Cell(n_prb=50, id=1, nof_ports=1, frame_type="tdd")
CELL_EXT = Cell(n_prb=50, id=1, nof_ports=1, cp=CP.EXT)


def _uci(nof_acks=0, **kw):
    acks = (AckCfg(nof_acks=nof_acks, ncce=kw.pop("ncce", (0,)),
                   tpc_for_pucch=kw.pop("tpc", 0),
                   tdd_ack_m=kw.pop("m", 1)),) if nof_acks else ()
    return UciUsage(acks=acks, **kw)


def test_select_format_matrix():
    cfg = PucchProcCfg()
    assert select_format(CELL, cfg, _uci(is_sr_tti=True)) == "1"
    assert select_format(CELL, cfg, _uci(1)) == "1a"
    assert select_format(CELL, cfg, _uci(2)) == "1b"
    assert select_format(CELL, cfg, _uci(4)) == "1b"  # channel selection
    assert select_format(CELL, cfg, _uci(cqi_enabled=True)) == "2"
    assert select_format(CELL, cfg, _uci(1, cqi_enabled=True)) == "2a"
    assert select_format(CELL, cfg, _uci(2, cqi_enabled=True)) == "2b"
    # extended CP: CQI + 1 ACK uses 2b
    assert select_format(CELL_EXT, cfg, _uci(1, cqi_enabled=True)) == "2b"
    # PUCCH3 mode with ACKs beyond the primary carrier
    cfg3 = PucchProcCfg(feedback_mode="pucch3")
    uci = UciUsage(acks=(AckCfg(nof_acks=2), AckCfg(nof_acks=2)))
    assert select_format(CELL, cfg3, uci) == "3"


def test_resources_fdd():
    cfg = PucchProcCfg(n_pucch_sr=7, n_pucch_1=36, n_pucch_2=80,
                       n3_pucch_an_list=(11, 12, 13, 14))
    # SR-positive overrides
    assert get_resources(CELL, cfg, _uci(1, sr_positive=True), "1a") == [7]
    # dynamic ACK: n_cce + N_pucch_1
    assert get_resources(CELL, cfg, _uci(1, ncce=(9,)), "1a") == [45]
    # format 2 / format 3
    assert get_resources(CELL, cfg, _uci(cqi_enabled=True), "2") == [80]
    assert get_resources(CELL, cfg, _uci(2, tpc=2), "3") == [13]
    # SPS: TPC command indexes the configured list
    sps = PucchProcCfg(sps_enabled=True, n_pucch_1_sps=(20, 21, 22, 23))
    assert get_resources(CELL, sps, _uci(1, tpc=3), "1a") == [23]


def test_resources_cs_two_carriers():
    cfg = PucchProcCfg(n_pucch_1=30, feedback_mode="cs",
                       n1_pucch_an_cs=((40, 41), (50, 51), (60, 61), (70, 71)))
    uci = UciUsage(acks=(AckCfg(nof_acks=2, ncce=(5,), grant_cc_idx=0),
                         AckCfg(nof_acks=2, ncce=(0,), grant_cc_idx=1,
                                tpc_for_pucch=2)))
    # PCell: ncce+N1, +1 for TB2; SCell: TPC-indexed configured pairs
    assert get_resources(CELL, cfg, uci, "1b") == [35, 36, 60, 61]


def test_n_pucch_tdd_brackets():
    # ncce below Np(1): m=0 of M=2 window
    n = n_pucch_tdd(3, 10, 50, m_total=2, m=0)
    np1 = 50 * (12 - 4) // 36  # Np(1) = 11
    assert n == (2 - 0 - 1) * 0 + 0 * np1 + 3 + 10
    # second slot of the window lands in a distinct region
    n2 = n_pucch_tdd(3, 10, 50, m_total=2, m=1)
    assert n2 == 0 * 0 + 1 * np1 + 3 + 10
    assert n2 != n


@pytest.mark.parametrize("a", [2, 3, 4])
def test_cs_tx_rx_inversion(a):
    """Every ACK/NACK pattern encodes to a (resource, b) that decodes back
    (36.213 tables 10.1.2.2.1-3/4/5 are self-consistent)."""
    for acks in itertools.product((NACK, ACK), repeat=a):
        j, b = _cs_tx(acks)
        assert 0 <= j < a and len(b) == 2
        got = cs_get_ack(a, j, b)
        if all(x == NACK for x in acks):
            # all-NACK decodes to nothing or all zeros (DTX-equivalent)
            assert got is None or got == [0] * a
        else:
            assert got == list(acks), f"acks={acks} j={j} b={b}"


def test_cs_rx_unknown_is_dtx():
    assert cs_get_ack(2, 0, (0, 1)) is None


def test_tdd_select_tables():
    # M=2 rows (36.213 table 10.1-2)
    assert tdd_select((ACK, ACK)) == (1, (1, 1))
    assert tdd_select((ACK, NACK)) == (0, (0, 1))
    assert tdd_select((ACK, DTX)) == (0, (0, 1))
    assert tdd_select((NACK, ACK)) == (1, (0, 0))
    assert tdd_select((DTX, ACK)) == (1, (0, 0))
    assert tdd_select((NACK, NACK)) == (1, (1, 0))
    assert tdd_select((NACK, DTX)) == (0, (1, 0))
    assert tdd_select((DTX, DTX)) is None
    # M=3/M=4: every non-all-DTX state hits a row, b in {0,1}^2
    for m in (3, 4):
        for harq in itertools.product((NACK, ACK, DTX), repeat=m):
            sel = tdd_select(harq)
            if all(h == DTX for h in harq):
                assert sel is None
            elif sel is not None:
                j, b = sel
                assert 0 <= j < m and set(b) <= {0, 1}


def test_get_npucch_end_to_end():
    cfg = PucchProcCfg(n_pucch_sr=7, n_pucch_1=36)
    # FDD 1-bit ACK
    n, b = get_npucch(CELL, cfg, _uci(1, ncce=(9,)), (ACK,))
    assert (n, b) == (45, (1,))
    # SR-positive TTI steals the SR resource
    n, b = get_npucch(CELL, cfg, _uci(1, ncce=(9,), sr_positive=True), (ACK,))
    assert (n, b) == (7, (1,))
    # TDD M=2 bundling window
    uci = _uci(2, ncce=(3, 3), m=2)
    n, b = get_npucch(CELL_TDD, cfg, uci, (ACK, ACK))
    assert n == n_pucch_tdd(3, 36, 50, 2, 1) and b == (1, 1)
    # CS mode with 4 ACK bits
    cfg_cs = PucchProcCfg(n_pucch_1=30, feedback_mode="cs")
    uci4 = UciUsage(acks=(AckCfg(nof_acks=2, ncce=(5,)),
                          AckCfg(nof_acks=2, ncce=(5,))))
    n, b = get_npucch(CELL, cfg_cs, uci4, (ACK, NACK, NACK, ACK))
    j, bexp = _cs_tx((ACK, NACK, NACK, ACK))
    assert b == bexp

"""RLC tests — analogs of lib/test/upper/rlc_*_test.cc: round trips,
segmentation/reassembly, out-of-order delivery, loss + AM retransmission,
and a randomized stress run (rlc_stress_test.cc style)."""

import numpy as np
import pytest

from srslte_tpu.rlc import RlcAm, RlcTm, RlcUm
from srslte_tpu.rlc.am import is_control, pack_status, unpack_status


def test_tm_passthrough():
    tm = RlcTm()
    tm.write_sdu(b"abc")
    assert tm.get_buffer_state() == 3
    assert tm.read_pdu(2) is None  # TM never segments
    pdu = tm.read_pdu(10)
    tm.write_pdu(pdu)
    assert tm.rx_sdus == [b"abc"]


def _pump(tx, rx, grant, drop=(), reorder=False, n_max=200):
    """Move PDUs tx->rx with optional loss/reordering; returns PDUs moved."""
    pdus = []
    for i in range(n_max):
        p = tx.read_pdu(grant)
        if p is None:
            break
        pdus.append(p)
    kept = [p for i, p in enumerate(pdus) if i not in drop]
    if reorder:
        kept = kept[::-1]
    for p in kept:
        rx.write_pdu(p)
    return pdus


def test_um_concat_and_segment():
    tx, rx = RlcUm(), RlcUm()
    sdus = [bytes([i]) * (20 + 30 * i) for i in range(5)]
    for s in sdus:
        tx.write_sdu(s)
    _pump(tx, rx, grant=45)
    assert rx.rx_sdus == sdus
    assert tx.get_buffer_state() == 0


def test_um_out_of_order():
    tx, rx = RlcUm(), RlcUm()
    sdus = [bytes([i]) * 10 for i in range(6)]
    for s in sdus:
        tx.write_sdu(s)
    pdus = []
    while (p := tx.read_pdu(12)) is not None:
        pdus.append(p)
    for p in [pdus[1], pdus[0], pdus[3], pdus[2]] + pdus[4:]:
        rx.write_pdu(p)
    assert rx.rx_sdus == sdus


def test_um_loss_drops_only_broken_sdu():
    tx, rx = RlcUm(t_reordering=2), RlcUm(t_reordering=2)
    sdus = [bytes([i]) * 30 for i in range(6)]
    for s in sdus:
        tx.write_sdu(s)
    pdus = []
    while (p := tx.read_pdu(17)) is not None:
        pdus.append(p)
    lost = 3
    for i, p in enumerate(pdus):
        if i != lost:
            rx.write_pdu(p)
    for _ in range(3):
        rx.tick()
    got = rx.rx_sdus
    # all SDUs not touching the lost PDU must be delivered intact, in order
    assert all(g in sdus for g in got)
    assert len(got) >= len(sdus) - 2
    order = [sdus.index(g) for g in got]
    assert order == sorted(order)


def test_am_basic_ack_flow():
    tx, rx = RlcAm(), RlcAm()
    sdus = [bytes([i]) * 50 for i in range(4)]
    for s in sdus:
        tx.write_sdu(s)
    _pump(tx, rx, grant=60)
    assert rx.rx_sdus == sdus
    # rx owes a status (poll bit on last PDU)
    status = rx.read_pdu(100)
    assert status is not None and is_control(status)
    tx.write_pdu(status)
    assert tx._vt_a == tx._vt_s  # everything acked
    assert not tx._tx_window


def test_am_nack_and_retx():
    tx, rx = RlcAm(poll_pdu=2, t_reordering=1), RlcAm(poll_pdu=2, t_reordering=1)
    sdus = [bytes([i]) * 40 for i in range(6)]
    for s in sdus:
        tx.write_sdu(s)
    pdus = _pump(tx, rx, grant=50, drop={2, 3})
    rx.tick()
    rx.tick()
    status = rx.read_pdu(100)
    assert status is not None
    ack, nacks = unpack_status(status)
    assert len(nacks) == 2
    tx.write_pdu(status)
    # retransmissions flow
    _pump(tx, rx, grant=60)
    assert rx.rx_sdus == sdus


def test_am_max_retx_escalates():
    tx = RlcAm(max_retx=3)
    tx.write_sdu(b"z" * 10)
    p = tx.read_pdu(30)
    sn = 0
    for _ in range(5):
        tx.write_pdu(pack_status(1, [sn]))
        got = tx.read_pdu(30)
        if got is None:
            break
    assert tx.max_retx_reached


def test_am_stress_random_loss():
    """Randomized loss/reordering; AM must deliver everything in order."""
    rng = np.random.default_rng(7)
    tx, rx = RlcAm(poll_pdu=3, t_reordering=1), RlcAm(t_reordering=1)
    sdus = [rng.integers(0, 256, rng.integers(5, 120)).astype(np.uint8).tobytes()
            for _ in range(40)]
    for s in sdus:
        tx.write_sdu(s)
    for rounds in range(60):
        # tx -> rx with 20% loss
        moved = False
        for _ in range(4):
            p = tx.read_pdu(80)
            if p is None:
                break
            moved = True
            if rng.random() > 0.2:
                rx.write_pdu(p)
        rx.tick()
        tx.tick()
        st = rx.read_pdu(200)
        if st is not None and rng.random() > 0.1:
            tx.write_pdu(st)
        if rx.rx_sdus == sdus:
            break
    assert rx.rx_sdus == sdus


def test_am_resegmentation_small_retx_grant():
    """A lost 3-SDU PDU is retransmitted through grants a third its size:
    RF=1 segments with SO/LSF must rebuild the exact SDU boundaries."""
    from srslte_tpu.rlc.am import AmdSegPdu, unpack_amd

    tx, rx = RlcAm(t_reordering=1), RlcAm(t_reordering=1)
    sdus = [bytes([0x40 + i]) * (30 + 7 * i) for i in range(3)]
    for s in sdus:
        tx.write_sdu(s)
    big = tx.read_pdu(200)  # one PDU carrying all three SDUs
    assert big is not None and tx.read_pdu(200) is None
    # lost; NACK it
    tx.write_pdu(pack_status(1, [0]))
    segs = []
    while True:
        p = tx.read_pdu(40)  # far smaller than the original PDU
        if p is None:
            break
        seg = unpack_amd(p)
        assert isinstance(seg, AmdSegPdu)
        segs.append(p)
    assert len(segs) >= 3
    for p in segs:
        rx.write_pdu(p)
    assert rx.rx_sdus == sdus


def test_am_resegmentation_out_of_order_parts():
    """Segment parts delivered shuffled still rebuild the original PDU."""
    from srslte_tpu.rlc.am import AmdSegPdu, unpack_amd

    tx, rx = RlcAm(), RlcAm()
    sdus = [b"a" * 25, b"bb" * 20, b"c" * 33]
    for s in sdus:
        tx.write_sdu(s)
    assert tx.read_pdu(200) is not None
    tx.write_pdu(pack_status(1, [0]))
    parts = []
    while (p := tx.read_pdu(35)) is not None:
        parts.append(p)
    assert len(parts) >= 3
    for p in reversed(parts):
        rx.write_pdu(p)
    assert rx.rx_sdus == sdus


def test_am_stress_random_loss_tiny_retx_grants():
    """Random loss with retx grants smaller than the original PDUs."""
    rng = np.random.default_rng(21)
    tx, rx = RlcAm(poll_pdu=3, t_reordering=1), RlcAm(t_reordering=1)
    sdus = [rng.integers(0, 256, rng.integers(20, 150)).astype(np.uint8)
            .tobytes() for _ in range(25)]
    for s in sdus:
        tx.write_sdu(s)
    for rounds in range(200):
        for _ in range(4):
            grant = int(rng.integers(30, 120))
            p = tx.read_pdu(grant)
            if p is None:
                break
            if rng.random() > 0.2:
                rx.write_pdu(p)
        rx.tick()
        tx.tick()
        st = rx.read_pdu(200)
        if st is not None and rng.random() > 0.1:
            tx.write_pdu(st)
        if rx.rx_sdus == sdus:
            break
    assert rx.rx_sdus == sdus


def test_status_so_granular_codec():
    """STATUS with E2=1 SOstart/SOend entries round-trips byte-exactly."""
    from srslte_tpu.rlc.am import SO_END_ALL, pack_status, unpack_status

    nacks = [3, (5, 10, 49), (5, 80, SO_END_ALL), 9]
    raw = pack_status(17, nacks)
    ack, got = unpack_status(raw)
    assert ack == 17 and got == nacks
    # empty NACK list
    ack, got = unpack_status(pack_status(4, []))
    assert ack == 4 and got == []


def test_am_so_granular_nack_retransmits_only_missing_range():
    """Receiver NACKs just the lost middle segment; the transmitter resends
    only those bytes (36.322 E2=1 path), not the whole PDU."""
    from srslte_tpu.rlc.am import AmdSegPdu, unpack_amd, unpack_status

    tx, rx = RlcAm(t_reordering=1), RlcAm(t_reordering=1)
    sdus = [bytes([0x40 + i]) * 40 for i in range(3)]
    for s in sdus:
        tx.write_sdu(s)
    big = tx.read_pdu(200)
    assert big is not None
    # force segmentation: NACK the whole PDU, read it back in 3 parts
    tx.write_pdu(__import__("srslte_tpu.rlc.am", fromlist=["pack_status"])
                 .pack_status(1, [0]))
    parts = []
    while (p := tx.read_pdu(60)) is not None:
        parts.append(p)
    assert len(parts) == 3
    # deliver only first and last part
    rx.write_pdu(parts[0])
    rx.write_pdu(parts[2])
    for _ in range(3):
        rx.tick()  # t-Reordering expiry triggers a STATUS
    st = rx.read_pdu(100)
    assert st is not None
    ack, nacks = unpack_status(st)
    assert len(nacks) == 1 and isinstance(nacks[0], tuple)
    sn, so_s, so_e = nacks[0]
    mid = unpack_amd(parts[1])
    assert sn == 0 and so_s == mid.so
    assert so_e == mid.so + sum(len(s) for s in mid.segments) - 1
    # transmitter resends exactly that range
    tx.write_pdu(st)
    resent = tx.read_pdu(200)
    assert resent is not None
    seg = unpack_amd(resent)
    assert isinstance(seg, AmdSegPdu) and seg.so == so_s
    assert sum(len(s) for s in seg.segments) == so_e - so_s + 1
    assert tx.read_pdu(200) is None or unpack_amd(tx.read_pdu(200)) is None
    rx.write_pdu(resent)
    assert rx.rx_sdus == sdus


def test_am_so_granular_open_tail():
    """Missing tail (no LSF received) NACKs with the 0x7FFF open-end."""
    from srslte_tpu.rlc.am import SO_END_ALL, pack_status, unpack_status

    tx, rx = RlcAm(t_reordering=1), RlcAm(t_reordering=1)
    tx.write_sdu(bytes(range(120)))
    assert tx.read_pdu(200) is not None
    tx.write_pdu(pack_status(1, [0]))
    parts = []
    while (p := tx.read_pdu(50)) is not None:
        parts.append(p)
    assert len(parts) >= 3
    rx.write_pdu(parts[0])  # head only
    for _ in range(3):
        rx.tick()
    st = rx.read_pdu(100)
    ack, nacks = unpack_status(st)
    assert any(isinstance(n, tuple) and n[2] == SO_END_ALL for n in nacks)
    tx.write_pdu(st)
    while (p := tx.read_pdu(50)) is not None:
        rx.write_pdu(p)
    assert rx.rx_sdus == [bytes(range(120))]


def test_am_stress_so_granular_loss():
    """Random segment loss converges using byte-range NACKs only."""
    rng = np.random.default_rng(5)
    tx, rx = RlcAm(poll_pdu=2, t_reordering=1), RlcAm(t_reordering=1)
    sdus = [rng.integers(0, 256, rng.integers(40, 200)).astype(np.uint8)
            .tobytes() for _ in range(15)]
    for s in sdus:
        tx.write_sdu(s)
    for rounds in range(300):
        for _ in range(3):
            p = tx.read_pdu(int(rng.integers(25, 90)))
            if p is None:
                break
            if rng.random() > 0.25:
                rx.write_pdu(p)
        rx.tick()
        tx.tick()
        st = rx.read_pdu(300)
        if st is not None and rng.random() > 0.1:
            tx.write_pdu(st)
        if rx.rx_sdus == sdus:
            break
    assert rx.rx_sdus == sdus

"""Sync chain tests: PSS/SSS detection, CFO, cell search.

Mirrors the reference's sync tests (lib/src/phy/sync/test/{sync_test.c,
cfo_test.c}): generate a DL signal, impair it, verify detection.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.common.params import Cell, OfdmParams
from srslte_tpu.phy.enb.enb_dl import EnbDl
from srslte_tpu.phy.sync.cfo import cfo_correct, cfo_estimate_cp
from srslte_tpu.phy.sync.pss import pss_cfo_compute, pss_find_peak, pss_time
from srslte_tpu.phy.sync.sss import m0m1, sss_find, sss_sequence
from srslte_tpu.phy.sync.sync import sync_find
from srslte_tpu.phy.ue.ue_cell_search import cell_search


def make_frame(cell: Cell, seed=0, n_sf=10):
    """One radio frame of time samples [n_sf * sf_len] (port 0)."""
    enb = EnbDl(cell)
    sfs = []
    for sf in range(n_sf):
        g = enb.empty_grids()
        g = enb.put_base(g, sf)
        sfs.append(np.asarray(enb.gen_signal(g))[0])
    return np.concatenate(sfs)


def test_m0m1_unique():
    pairs = {m0m1(i) for i in range(168)}
    assert len(pairs) == 168
    for m0, m1 in pairs:
        assert 0 <= m0 < 31 and 0 <= m1 < 31


@pytest.mark.parametrize("n_id_1,n_id_2,sf5", [(0, 0, False), (167, 2, True),
                                               (84, 1, False), (25, 2, True)])
def test_sss_detect_clean(n_id_1, n_id_2, sf5):
    d = jnp.asarray(sss_sequence(n_id_1, n_id_2, sf5).astype(np.complex64))
    nid1, got_sf5, metric = sss_find(d, n_id_2)
    assert int(nid1) == n_id_1
    assert bool(got_sf5) == sf5
    assert float(metric) > 0.5


def test_sss_detect_noisy_phase_ramp():
    rng = np.random.default_rng(3)
    d = sss_sequence(101, 1, False).astype(np.complex64)
    # timing-offset phase ramp + noise
    ramp = np.exp(2j * np.pi * 0.002 * np.arange(62))
    x = d * ramp + 0.3 * (rng.standard_normal(62) + 1j * rng.standard_normal(62))
    nid1, sf5, _ = sss_find(jnp.asarray(x.astype(np.complex64)), 1)
    assert int(nid1) == 101 and not bool(sf5)


def test_pss_find_peak_offset_and_root():
    p = OfdmParams(6)
    rng = np.random.default_rng(0)
    for nid2, delay in [(0, 500), (1, 1333), (2, 17)]:
        x = 0.05 * (rng.standard_normal(4000) + 1j * rng.standard_normal(4000))
        x[delay : delay + p.symbol_sz] += 3.0 * pss_time(nid2, p.symbol_sz)
        got2, off, metric = pss_find_peak(jnp.asarray(x.astype(np.complex64)),
                                          p.symbol_sz)
        assert int(got2) == nid2
        assert abs(int(off) - delay) <= 1
        assert float(metric) > 0.3


def test_pss_cfo_estimate():
    p = OfdmParams(6)
    rep = pss_time(1, p.symbol_sz)
    for cfo in (-0.7, -0.1, 0.25, 1.2):
        x = rep * np.exp(2j * np.pi * cfo * np.arange(p.symbol_sz) / p.symbol_sz)
        est = pss_cfo_compute(jnp.asarray(x.astype(np.complex64)), jnp.int32(1),
                              p.symbol_sz)
        # half-symbol method is unambiguous only within +-1 subcarrier
        expect = ((cfo + 1) % 2) - 1
        assert abs(float(est) - expect) < 0.02, (cfo, float(est))


def test_cfo_correct_roundtrip():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(np.complex64)
    y = cfo_correct(jnp.asarray(x), 0.33, 128)
    z = cfo_correct(y, -0.33, 128)
    np.testing.assert_allclose(np.asarray(z), x, atol=1e-5)


def test_cfo_estimate_cp():
    cell = Cell(n_prb=6, id=7)
    p = cell.ofdm
    sf = make_frame(cell, n_sf=1)
    for cfo in (-0.4, 0.15):
        imp = sf * np.exp(2j * np.pi * cfo * np.arange(len(sf)) / p.symbol_sz)
        est = cfo_estimate_cp(jnp.asarray(imp.astype(np.complex64)), p)
        assert abs(float(est) - cfo) < 0.02


def test_sync_find_full_subframe():
    cell = Cell(n_prb=6, id=301)
    p = cell.ofdm
    frame = make_frame(cell)
    rng = np.random.default_rng(5)
    delay = 777
    cfo = 0.21
    x = np.concatenate([np.zeros(delay, np.complex64), frame])
    x = x * np.exp(2j * np.pi * cfo * np.arange(len(x)) / p.symbol_sz)
    x += 0.02 * (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
    win = x[: p.sf_len + 4 * p.symbol_sz]
    r = sync_find(jnp.asarray(win.astype(np.complex64)), p)
    assert int(r.n_id_2) == cell.n_id_2
    assert int(r.n_id_1) == cell.n_id_1
    assert int(r.cell_id) == cell.id
    assert not bool(r.sf5)  # window starts at subframe 0
    pss_pos = delay + p.slot_len - p.symbol_sz
    assert abs(int(r.peak_offset) - pss_pos) <= 1
    assert abs(float(r.cfo) - cfo) < 0.03


def test_cell_search_stream():
    cell = Cell(n_prb=6, id=123)
    p = cell.ofdm
    frame = make_frame(cell)
    rng = np.random.default_rng(9)
    delay = 2049
    cfo = -0.3
    x = np.concatenate([np.zeros(delay, np.complex64), frame, frame])
    x = x * np.exp(2j * np.pi * cfo * np.arange(len(x)) / p.symbol_sz)
    noise = 0.05 * (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
    r = cell_search(jnp.asarray((x + noise).astype(np.complex64)), p)
    assert int(r.cell_id) == cell.id
    assert int(r.votes) >= 2
    assert abs(float(r.cfo) - cfo) < 0.05
    # reported offset must be a PSS position: (offset - slot + N) mod 5ms == delay mod 5ms
    half = p.srate * 5 // 1000
    sf_start = (int(r.peak_offset) - p.slot_len + p.symbol_sz) % half
    assert abs(sf_start - delay % half) <= 1


def test_refsignal_dl_sync_finds_cell_and_cfo():
    """CRS-signature correlation finder (refsignal_dl_sync.c analog):
    locates the cell's subframe in a capture, estimates CFO, and rejects
    wrong cell-id hypotheses."""
    import jax.numpy as jnp

    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.sync.refsignal_sync import (cell_find,
                                                    crs_time_signature,
                                                    refsignal_dl_sync_find)

    rng = np.random.default_rng(0)
    cell = Cell(n_prb=15, id=123, nof_ports=1)
    sig = crs_time_signature(cell, 0)
    n, off_true, cfo = 10000, 3137, 0.01
    x = 0.05 * (rng.standard_normal(n)
                + 1j * rng.standard_normal(n)).astype(np.complex64)
    t = np.arange(len(sig))
    rot = np.exp(2j * np.pi * cfo * t / cell.ofdm.symbol_sz)
    x[off_true : off_true + len(sig)] += (2.0 * sig * rot).astype(np.complex64)
    xs = jnp.asarray(x)
    off, metric, cfo_est = refsignal_dl_sync_find(xs, cell, 0)
    assert abs(off - off_true) <= 1 and metric > 6
    assert abs(cfo_est - cfo) < 0.005
    got = cell_find(xs, 15, [7, 123, 200], 0)
    assert got is not None and got[0] == 123
    assert cell_find(xs, 15, [7, 200], 0) is None


# -- TDD frame structure type 2 (36.211 §6.11 type-2 PSS/SSS placement) ------

def test_sync_find_tdd_and_auto():
    """TDD signal: SSS closes sf0/5, PSS in symbol 2 of sf1/6; sync_find
    locates the cell with frame_type="tdd" and detects type 2 blindly with
    "auto" (sync.c frame-type detection analog)."""
    cell = Cell(n_prb=6, id=151, frame_type="tdd")
    s = make_frame(cell, n_sf=10)
    noisy = s + 0.05 * (np.random.default_rng(5).standard_normal(len(s))
                        + 1j * np.random.default_rng(6).standard_normal(len(s))
                        ).astype(np.complex64)
    p = cell.ofdm
    # window starting mid-sf9 of the previous frame: PSS of sf1 inside
    win = jnp.asarray(noisy[: p.sf_len * 3])
    r = sync_find(win, p, "tdd")
    assert int(r.cell_id) == 151
    assert not bool(r.sf5)
    assert bool(r.tdd)
    # sf_start points at subframe 0 (the SSS subframe)
    assert int(r.sf_start) == 0
    ra = sync_find(win, p, "auto")
    assert int(ra.cell_id) == 151 and bool(ra.tdd)
    assert int(ra.sf_start) == 0
    # the second half-frame detects sf5
    win5 = jnp.asarray(noisy[p.sf_len * 4 : p.sf_len * 8])
    r5 = sync_find(win5, p, "auto")
    assert int(r5.cell_id) == 151 and bool(r5.sf5) and bool(r5.tdd)
    assert int(r5.sf_start) + p.sf_len * 4 == p.sf_len * 5


def test_sync_auto_keeps_fdd():
    """An FDD signal through frame_type="auto" must not flip to TDD."""
    cell = Cell(n_prb=6, id=33)
    s = make_frame(cell, n_sf=10)
    p = cell.ofdm
    r = sync_find(jnp.asarray(s[: p.sf_len * 2]), p, "auto")
    assert int(r.cell_id) == 33 and not bool(r.tdd)
    assert int(r.sf_start) == 0


def test_cell_search_tdd_stream():
    cell = Cell(n_prb=6, id=407, frame_type="tdd")
    s = np.concatenate([make_frame(cell, n_sf=10)] * 2)
    r = cell_search(jnp.asarray(s), cell.ofdm, "auto")
    assert int(r.cell_id) == 407
    assert bool(r.tdd)
    assert int(r.votes) >= 2

"""Polar SCL list decoder + NR PDCCH blind search.

Reference behavior: lib/src/phy/fec/polar/polar_decoder_ssc_*.c (list
variants), lib/src/phy/phch/pdcch_nr.c, lib/src/phy/ch_estimation/
dmrs_pdcch.c.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.fec.polar import (PolarCode, input_interleaver,
                                      polar_decode, polar_decode_list,
                                      polar_encode)
from srslte_tpu.phy.nr.params import NSYMB_SLOT, NrCarrier
from srslte_tpu.phy.nr.pdcch_nr import (Coreset, NrPdcch, NrSearchSpace,
                                        pdcch_nr_locations)


def test_input_interleaver_is_permutation():
    for k in (20, 39, 64, 140, 164):
        il = input_interleaver(k)
        assert sorted(il.tolist()) == list(range(k))


def test_scl_equals_sc_at_list_1():
    rng = np.random.default_rng(3)
    code = PolarCode(K=40, E=108)
    for _ in range(5):
        bits = rng.integers(0, 2, code.K).astype(np.uint8)
        x = np.asarray(polar_encode(jnp.asarray(bits), code)).astype(np.float32)
        y = (1 - 2 * x) + 0.4 * rng.standard_normal(code.E)
        llr = jnp.asarray(-y * 8, jnp.float32)
        sc = np.asarray(polar_decode(llr, code))
        scl = np.asarray(polar_decode_list(llr, code, L=1))[0]
        assert np.array_equal(sc, scl)


def test_scl_beats_sc_at_low_snr():
    """List-8 (genie-selected) must dominate plain SC (CA-SCL gain)."""
    rng = np.random.default_rng(7)
    code = PolarCode(K=64, E=128)
    sigma = 10 ** (1.0 / 20)  # -1 dB
    ok_sc = ok_l = 0
    for _ in range(40):
        bits = rng.integers(0, 2, code.K).astype(np.uint8)
        x = np.asarray(polar_encode(jnp.asarray(bits), code)).astype(np.float32)
        y = (1 - 2 * x) + sigma * rng.standard_normal(code.E)
        llr = jnp.asarray(-y * 2 / sigma**2, jnp.float32)
        ok_sc += int((np.asarray(polar_decode(llr, code)) == bits).all())
        cands = np.asarray(polar_decode_list(llr, code, L=8))
        ok_l += int(any((c == bits).all() for c in cands))
    assert ok_l > ok_sc
    assert ok_l >= 10  # sanity: the list finds a nontrivial fraction


def test_scl_best_path_first():
    """Candidates come metric-sorted: on a clean channel the first is it."""
    rng = np.random.default_rng(11)
    code = PolarCode(K=48, E=216)
    bits = rng.integers(0, 2, code.K).astype(np.uint8)
    x = np.asarray(polar_encode(jnp.asarray(bits), code)).astype(np.float32)
    llr = jnp.asarray(-(1 - 2 * x) * 10, jnp.float32)
    cands = np.asarray(polar_decode_list(llr, code, L=8))
    assert np.array_equal(cands[0], bits)


# -- NR PDCCH ---------------------------------------------------------------

def _setup(duration=1, scrambling_id=None):
    car = NrCarrier(n_prb=52, n_id=123)
    cs = Coreset(tuple([True] * 8), duration=duration, id=1,
                 dmrs_scrambling_id=scrambling_id)
    return car, cs


def test_search_space_hash_in_range():
    car, cs = _setup()
    ss = NrSearchSpace(ue_specific=True, nof_candidates=(2, 2, 2, 1, 0))
    for slot in range(5):
        for agg_idx in range(4):
            L = 1 << agg_idx
            for ncce in pdcch_nr_locations(cs, ss, 0x4601, agg_idx, slot):
                assert ncce % L == 0 and ncce + L <= cs.n_cce


@pytest.mark.parametrize("duration", [1, 2])
@pytest.mark.parametrize("agg_idx", [1, 2, 3])
def test_pdcch_nr_roundtrip(duration, agg_idx):
    car, cs = _setup(duration)
    ss = NrSearchSpace(ue_specific=True, nof_candidates=(0, 2, 2, 1, 0))
    rnti, slot = 0x4601, 2
    pd = NrPdcch(car, cs, slot=slot)
    rng = np.random.default_rng(agg_idx)
    payload = rng.integers(0, 2, 39).astype(np.uint8)
    locs = pdcch_nr_locations(cs, ss, rnti, agg_idx, slot)
    assert locs
    L = 1 << agg_idx
    grid = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    grid = pd.encode(grid, payload, rnti, locs[0], L)
    h0 = 0.85 * np.exp(1.1j)
    rng2 = np.random.default_rng(5)
    rx = np.asarray(grid) * h0 + 0.05 * (
        rng2.standard_normal(grid.shape) + 1j * rng2.standard_normal(grid.shape))
    rx = jnp.asarray(rx.astype(np.complex64))
    cands = [(n, L) for n in locs] + \
        [(n, 2) for n in pdcch_nr_locations(cs, ss, rnti, 1, slot)
         if agg_idx != 1]
    hit = pd.search(rx, rnti, len(payload), cands)
    assert hit is not None
    (loc, bits) = hit
    assert loc == (locs[0], L)
    assert np.array_equal(bits, payload)


def test_pdcch_nr_wrong_rnti_silent():
    car, cs = _setup()
    ss = NrSearchSpace(ue_specific=True, nof_candidates=(0, 0, 2, 1, 0))
    pd = NrPdcch(car, cs, slot=0)
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 2, 30).astype(np.uint8)
    locs = pdcch_nr_locations(cs, ss, 0x17A5, 2, 0)
    grid = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    grid = pd.encode(grid, payload, 0x17A5, locs[0], 4)
    other = pdcch_nr_locations(cs, ss, 0x3333, 2, 0)
    assert pd.search(grid, 0x3333, len(payload),
                     [(n, 4) for n in other]) is None


def test_pdcch_nr_ue_scrambling_id():
    """UE-specific scrambling (dmrs_scrambling_id + RNTI in c_init)."""
    car, cs = _setup(scrambling_id=77)
    ss = NrSearchSpace(ue_specific=True, nof_candidates=(0, 0, 2, 0, 0))
    rnti, slot = 0x2B0, 1
    pd = NrPdcch(car, cs, slot=slot)
    payload = np.ones(24, np.uint8)
    locs = pdcch_nr_locations(cs, ss, rnti, 2, slot)
    grid = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    grid = pd.encode(grid, payload, rnti, locs[0], 4)
    hit = pd.search(grid, rnti, len(payload), [(n, 4) for n in locs])
    assert hit is not None and np.array_equal(hit[1], payload)


@pytest.mark.parametrize("dur,Lb,R", [(1, 6, 2), (1, 2, 3), (2, 6, 2)])
def test_interleaved_cce_to_reg_partition(dur, Lb, R):
    """38.211 §7.3.2.2: with interleaving, the CCEs still partition the
    CORESET's REs, and at least one CCE's REGs are non-contiguous."""
    from srslte_tpu.phy.nr.pdcch_nr import _candidate_res

    car = NrCarrier(n_prb=48, n_id=17)
    cs = Coreset(tuple([True] * 8), duration=dur, id=1, interleaved=True,
                 reg_bundle_size=Lb, interleaver_size=R)
    cs_plain = Coreset(tuple([True] * 8), duration=dur, id=1)
    seen = set()
    moved = 0
    for ncce in range(cs.n_cce):
        data, dmrs, _ = _candidate_res(car, cs, ncce, 1)
        res = set(data.tolist()) | set(dmrs.tolist())
        assert len(res) == 6 * 12  # one CCE = 6 REGs = 72 REs
        assert not (seen & res)
        seen |= res
        d0, m0, _ = _candidate_res(car, cs_plain, ncce, 1)
        if res != set(d0.tolist()) | set(m0.tolist()):
            moved += 1
    assert len(seen) == cs.bw_prb * dur * 12
    assert moved > 0  # the interleaver is a nontrivial REG permutation


def test_pdcch_nr_interleaved_roundtrip():
    """Blind search finds the DCI on an interleaved CORESET through a
    frequency-selective channel (per-RB chest must follow the scatter)."""
    car = NrCarrier(n_prb=48, n_id=17)
    cs = Coreset(tuple([True] * 8), duration=1, id=1, interleaved=True,
                 reg_bundle_size=2, interleaver_size=2, shift_index=11)
    ss = NrSearchSpace(ue_specific=True, nof_candidates=(0, 2, 2, 1, 0))
    rnti, slot = 0x4601, 3
    pd = NrPdcch(car, cs, slot=slot)
    rng = np.random.default_rng(23)
    payload = rng.integers(0, 2, 39).astype(np.uint8)
    locs = pdcch_nr_locations(cs, ss, rnti, 2, slot)
    grid = jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64)
    grid = pd.encode(grid, payload, rnti, locs[0], 4)
    k = np.arange(car.nof_re)
    H = 1.0 + 0.4 * np.exp(-2j * np.pi * k * 3 / car.nof_re)
    rx = np.asarray(grid) * H[None, :] + 0.04 * (
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape))
    hit = pd.search(jnp.asarray(rx.astype(np.complex64)), rnti,
                    len(payload), [(n, 4) for n in locs])
    assert hit is not None and hit[0] == (locs[0], 4)
    assert np.array_equal(hit[1], payload)

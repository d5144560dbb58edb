"""PMCH/MBSFN and TDD special-subframe (DwPTS) PDSCH processing.

Reference behavior: lib/src/phy/phch/pmch.c, ch_estimation/refsignal_dl.c
MBSFN RS, ra_dl.c:402 DwPTS TBS scaling, gen_mch_tables.c geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.common.params import CP, Cell
from srslte_tpu.phy.common.tdd import SPECIAL_SF_SYMBOLS, TddConfig
from srslte_tpu.phy.ofdm import Ofdm
from srslte_tpu.phy.phch.pdsch import Pdsch, nof_re_pdsch
from srslte_tpu.phy.phch.pmch import (MBSFN_RS_SYMBOLS, Pmch,
                                      mbsfn_rs_subcarriers, mbsfn_rs_values,
                                      pmch_re_indices)
from srslte_tpu.phy.phch.ra import DlGrant


def test_mbsfn_rs_geometry():
    n_prb = 25
    scs = mbsfn_rs_subcarriers(n_prb)
    assert scs.shape == (3, 6 * n_prb)
    # 6 pilots per PRB, offsets 0/1/0, step 2
    assert scs[0, 0] == 0 and scs[1, 0] == 1 and scs[2, 0] == 0
    assert (np.diff(scs, axis=1) == 2).all()
    vals = mbsfn_rs_values(n_prb, area_id=1, sf_idx=3)
    assert np.allclose(np.abs(vals), 1.0, atol=1e-6)
    # different area ids give different sequences
    assert not np.allclose(vals, mbsfn_rs_values(n_prb, 2, 3))


def test_pmch_re_count():
    cell = Cell(n_prb=6, id=1, nof_ports=1, cp=CP.EXT)
    idx = pmch_re_indices(cell, non_mbsfn_region=2)
    # 10 data symbols x 72 SC - 3 RS symbols x 36 pilots
    assert len(idx) == 10 * 72 - 3 * 36


@pytest.mark.parametrize("mcs", [4, 12, 20])
def test_pmch_roundtrip_over_ofdm(mcs):
    cell = Cell(n_prb=25, id=5, nof_ports=1, cp=CP.EXT)
    p = Pmch(cell, area_id=1, sf_idx=3, mcs=mcs)
    rng = np.random.default_rng(mcs)
    bits = jnp.asarray(rng.integers(0, 2, p.cfg.tbs).astype(np.float32))
    o = cell.ofdm
    tx = p.encode(bits, jnp.zeros((o.nsymb_sf, o.nof_re), np.complex64))
    ofdm = Ofdm(cell.ofdm, normalize=True)
    s = np.asarray(ofdm.tx_sf(tx))
    s = s + 0.01 * (rng.standard_normal(s.shape)
                    + 1j * rng.standard_normal(s.shape))
    grid_rx = ofdm.rx_sf(jnp.asarray(s.astype(np.complex64)))
    out, ok = p.decode(grid_rx)
    assert bool(ok)
    assert np.array_equal(np.asarray(out), np.asarray(bits))


def test_pmch_wrong_area_id_fails():
    cell = Cell(n_prb=6, id=5, nof_ports=1, cp=CP.EXT)
    p = Pmch(cell, area_id=1, sf_idx=1, mcs=8)
    rng = np.random.default_rng(1)
    bits = jnp.asarray(rng.integers(0, 2, p.cfg.tbs).astype(np.float32))
    o = cell.ofdm
    tx = p.encode(bits, jnp.zeros((o.nsymb_sf, o.nof_re), np.complex64))
    p_bad = Pmch(cell, area_id=2, sf_idx=1, mcs=8)
    out, ok = p_bad.decode(tx)
    assert not bool(ok)


# -- TDD DwPTS --------------------------------------------------------------

def test_dwpts_tbs_scaling():
    import dataclasses

    g = DlGrant.full(50, mcs=10)
    gd = dataclasses.replace(g, is_dwpts=True)
    # DwPTS TBS looked up at max(1, 0.75 * 50) = 37 PRB (ra_dl.c:403)
    from srslte_tpu.phy.phch.ra import dl_tbs

    assert gd.tbs == dl_tbs(10, 37)
    assert gd.tbs < g.tbs


# ss_configs 0 and 5 (3-symbol DwPTS) carry no PDSCH (36.213 §7.1.7)
@pytest.mark.parametrize("ss_config", [3, 4, 8])
def test_dwpts_pdsch_roundtrip(ss_config):
    """PDSCH confined to the DwPTS symbols of a special subframe."""
    tdd = TddConfig(sf_config=1, ss_config=ss_config)
    dw = tdd.nof_dw
    assert dw == SPECIAL_SF_SYMBOLS[ss_config][0]
    cell = Cell(n_prb=15, id=7, nof_ports=1)
    import dataclasses
    g = dataclasses.replace(DlGrant.full(15, mcs=8), is_dwpts=True)
    p = Pdsch(cell, g, sf_idx=1, cfi=2, rnti=0x99, dwpts_symbols=dw)
    # no REs beyond the DwPTS region
    o = cell.ofdm
    assert p.re_idx.max() < dw * o.nof_re
    assert p.cfg.G < nof_re_pdsch(cell, g, 1, 2) * 2  # truncated vs full sf
    rng = np.random.default_rng(ss_config)
    bits = jnp.asarray(rng.integers(0, 2, g.tbs).astype(np.float32))
    grids = jnp.zeros((1, o.nsymb_sf, o.nof_re), np.complex64)
    tx = p.encode(bits, grids)
    # GP/UpPTS symbols must stay empty
    assert not np.abs(np.asarray(tx)[0, dw:, :]).any()
    ce = jnp.ones((1, o.nsymb_sf, o.nof_re), np.complex64)
    out, ok = p.decode(tx[0], ce, 1e-4)
    assert bool(ok)
    assert np.array_equal(np.asarray(out), np.asarray(bits))

"""NR 2-layer PDSCH: layer map, DMRS port fd-OCC CDM, 2x2 MMSE decode.

Reference behavior: lib/src/phy/phch/pdsch_nr.c with
srsran_layermap_nr/srsran_layerdemap_nr (mimo/layermap.c:229,262) and the
type-1 DMRS port OCC of ch_estimation/dmrs_sch.c (38.211 table 7.4.1.1.2-1).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.nr.params import NSYMB_SLOT, NrCarrier
from srslte_tpu.phy.nr.pdsch_nr import NrPdsch
from srslte_tpu.phy.nr.ra_nr import NrGrant


def _mimo_chan(g, h, rng, sigma):
    """g [2tx, nsym, nre] port grids -> y [2rx, nsym, nre] through flat H."""
    x = np.asarray(g)
    y = np.einsum("rp,p...->r...", h, x)
    y = y + sigma * (rng.standard_normal(y.shape)
                     + 1j * rng.standard_normal(y.shape))
    return jnp.asarray(y.astype(np.complex64))


H = np.array([[1.0 + 0.1j, 0.35 - 0.2j],
              [-0.3 + 0.25j, 0.9 - 0.15j]], np.complex64)


@pytest.mark.parametrize("qm,rate,snr_db", [(2, 0.30, 10.0), (4, 0.48, 16.0),
                                            (6, 0.50, 22.0)])
def test_nr_pdsch_2layer_roundtrip(qm, rate, snr_db):
    car = NrCarrier(n_prb=24, n_id=42)
    p = NrPdsch(car, mcs_qm=qm, rate=rate, slot=4, n_layers=2)
    assert p.cfg.G == 2 * len(p.re_idx) * qm  # both layers carry bits
    rng = np.random.default_rng(qm)
    bits = rng.integers(0, 2, p.tbs).astype(np.uint8)
    g = p.encode(jnp.asarray(bits, jnp.float32))
    assert g.shape == (2, NSYMB_SLOT, car.nof_re)
    sigma = 10 ** (-snr_db / 20) / np.sqrt(2)
    out, ok, _ = p.decode(_mimo_chan(g, H, rng, sigma))
    assert bool(np.asarray(ok))
    assert np.array_equal(np.asarray(out), bits)


def test_nr_pdsch_dmrs_port_occ_is_cdm():
    """Port 1001's DMRS is the port-1000 sequence with alternating signs on
    the shared comb (fd-OCC), so the pair sum/difference separates them."""
    car = NrCarrier(n_prb=6, n_id=7)
    p = NrPdsch(car, n_layers=2, slot=1)
    ks, pil, occ = p._dmrs(p._dmrs_syms[0])
    assert np.array_equal(np.unique(occ), [-1, 1])
    g = p.encode(jnp.asarray(np.zeros(p.tbs, np.float32)))
    a = np.asarray(g)[0, p._dmrs_syms[0], ks]
    b = np.asarray(g)[1, p._dmrs_syms[0], ks]
    np.testing.assert_allclose(b, a * occ, rtol=1e-6)
    # CDM separation: sum picks port 1000, difference picks port 1001
    pair_sum = (a + b).reshape(-1, 2)
    np.testing.assert_allclose(pair_sum[:, 1], 0, atol=1e-6)


def test_nr_grant_2layer_tbs_scales():
    g1 = NrGrant(prb_start=0, n_prb=24, mcs=20)
    g2 = NrGrant(prb_start=0, n_prb=24, mcs=20, n_layers=2)
    assert g2.tbs > 1.8 * g1.tbs


def test_nr_pdsch_2layer_grant_mode():
    car = NrCarrier(n_prb=52, n_id=11)
    grant = NrGrant(prb_start=8, n_prb=16, mcs=16, n_layers=2)
    p = NrPdsch(car, rnti=0x17, slot=6, grant=grant)
    rng = np.random.default_rng(6)
    bits = rng.integers(0, 2, p.tbs).astype(np.uint8)
    g = p.encode(jnp.asarray(bits, jnp.float32))
    out, ok, _ = p.decode(_mimo_chan(g, H, rng, 10 ** (-20 / 20)))
    assert bool(np.asarray(ok)) and np.array_equal(np.asarray(out), bits)

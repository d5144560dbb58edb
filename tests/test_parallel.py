"""Scale-out tests on the virtual 8-device CPU mesh (conftest sets it up).

Gates: sharded results must match the single-device chain exactly
(BASELINE.md config 5 correctness side; efficiency is measured on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np

from srslte_tpu.parallel import ShardedDlPipeline, make_mesh, sharded_pss_search
from srslte_tpu.phy.common.params import Cell, OfdmParams
from srslte_tpu.phy.phch.ra import DlGrant
from srslte_tpu.phy.sync.pss import pss_find_peak, pss_time


def test_make_mesh_shapes():
    m = make_mesh({"carrier": -1})
    assert m.devices.shape == (8,)
    m2 = make_mesh({"host": 2, "carrier": 4})
    assert m2.axis_names == ("host", "carrier")


def test_sharded_dl_pipeline_matches_single_device():
    cell = Cell(n_prb=6, id=3)
    grant = DlGrant.full(6, 5)
    pipe = ShardedDlPipeline(cell, grant)
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (8, 2, grant.tbs)).astype(np.uint8)

    mesh = make_mesh({"carrier": 8})
    step = pipe.jit_e2e(mesh)
    out_s, ok_s, bler_s = step(jnp.asarray(bits))
    assert np.asarray(ok_s).all()
    assert float(bler_s) == 0.0
    np.testing.assert_array_equal(np.asarray(out_s), bits)

    # single device reference
    out_1, ok_1, bler_1 = jax.jit(pipe.e2e)(jnp.asarray(bits))
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_1))


def test_sharded_pss_search_matches_unsharded():
    p = OfdmParams(6)
    rng = np.random.default_rng(4)
    n = 8 * 2048
    x = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    delay, nid2 = 5555, 1
    x[delay : delay + p.symbol_sz] += 3.0 * pss_time(nid2, p.symbol_sz)
    x = jnp.asarray(x.astype(np.complex64))

    mesh = make_mesh({"t": 8})
    g_n, g_off, g_m = sharded_pss_search(x, p.symbol_sz, mesh)
    assert int(g_n) == nid2
    assert abs(int(g_off) - delay) <= 1

    # crossing a shard boundary (chunk = 2048): peak at 2048*3 - 60
    x2 = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    d2 = 3 * 2048 - 60
    x2[d2 : d2 + p.symbol_sz] += 3.0 * pss_time(2, p.symbol_sz)
    g_n2, g_off2, _ = sharded_pss_search(jnp.asarray(x2.astype(np.complex64)),
                                         p.symbol_sz, mesh)
    assert int(g_n2) == 2
    assert abs(int(g_off2) - d2) <= 1

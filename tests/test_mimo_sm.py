"""2-layer spatial multiplexing tests (TM3 CDD / TM4 codebook, 2x2 MMSE).

Analog of precoding.c 2x2 kernels + pdsch.c dual-TB path tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.chest.chest_dl import ChestDL
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.enb.enb_dl import EnbDl
from srslte_tpu.phy.mimo.mimo import mmse_sm_2layer, precode_sm_2layer
from srslte_tpu.phy.ofdm import Ofdm
from srslte_tpu.phy.phch.pdsch import PdschSm
from srslte_tpu.phy.phch.ra import DlGrant


@pytest.mark.parametrize("pmi", [None, 0, 1, 2])
def test_precode_mmse_roundtrip(pmi):
    rng = np.random.default_rng(0)
    n = 256
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
         ).astype(np.complex64)
    ports = precode_sm_2layer(jnp.asarray(x), pmi)
    h = (rng.standard_normal((2, 2, 1)) + 1j * rng.standard_normal((2, 2, 1))
         ).astype(np.complex64) * np.ones((1, 1, n), np.complex64)
    y = jnp.einsum("rkn,kn->rn", jnp.asarray(h), ports)
    xhat, gain = mmse_sm_2layer(y, jnp.asarray(h), jnp.asarray([1e-4]), pmi)
    np.testing.assert_allclose(np.asarray(xhat), x, atol=2e-2)


@pytest.mark.parametrize("pmi", [None, 1])
def test_pdsch_sm_e2e(pmi):
    """Dual-TB PDSCH over a 2x2 channel with real CRS channel estimation."""
    rng = np.random.default_rng(3)
    cell = Cell(n_prb=15, id=11, nof_ports=2)
    grant = DlGrant.full(15, 8)
    pdsch = PdschSm(cell, grant, sf_idx=3, rnti=0x77, pmi=pmi)
    enb = EnbDl(cell)
    bits0 = rng.integers(0, 2, (grant.tbs,)).astype(np.uint8)
    bits1 = rng.integers(0, 2, (grant.tbs,)).astype(np.uint8)
    g = enb.put_base(enb.empty_grids(), 3)
    g = pdsch.encode2(jnp.asarray(bits0), jnp.asarray(bits1), g)
    tx = np.asarray(enb.gen_signal(g))  # [2tx, sf_len]

    # 2x2 flat channel + AWGN, 2 RX antennas
    h = np.array([[1.0 + 0.2j, 0.5 - 0.4j], [0.3 + 0.6j, -0.9 + 0.1j]],
                 np.complex64)
    rx = h @ tx
    rx += 0.02 * (rng.standard_normal(rx.shape)
                  + 1j * rng.standard_normal(rx.shape))

    ofdm = Ofdm(cell.ofdm, normalize=True)
    grids = ofdm.rx_sf(jnp.asarray(rx.astype(np.complex64)))  # [2rx, nsym, nre]
    ce, info = ChestDL(cell).estimate(grids, 3)  # [2rx, 2tx, nsym, nre]
    (out0, ok0), (out1, ok1) = pdsch.decode2(grids, ce, info["noise"])
    assert bool(np.asarray(ok0)) and bool(np.asarray(ok1))
    np.testing.assert_array_equal(np.asarray(out0), bits0)
    np.testing.assert_array_equal(np.asarray(out1), bits1)

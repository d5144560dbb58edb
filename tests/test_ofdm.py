"""OFDM mod/demod tests — analog of lib/src/phy/dft/test/ofdm_test.c."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.common.params import CP, OfdmParams
from srslte_tpu.phy.ofdm import Ofdm


def _rand_grid(rng, p: OfdmParams, batch=()):
    shape = batch + (p.nsymb_sf, p.nof_re)
    qpsk = (rng.integers(0, 2, shape + (2,)) * 2 - 1).astype(np.float32)
    return ((qpsk[..., 0] + 1j * qpsk[..., 1]) / np.sqrt(2)).astype(np.complex64)


@pytest.mark.parametrize("n_prb", [6, 15, 25, 50, 75, 100])
def test_roundtrip_all_prb(n_prb):
    """ofdm_test.c round-trip gate, all standard bandwidths."""
    rng = np.random.default_rng(n_prb)
    p = OfdmParams(n_prb)
    m = Ofdm(p, normalize=True)
    grid = _rand_grid(rng, p)
    out = np.asarray(m.rx_sf(m.tx_sf(jnp.asarray(grid))))
    np.testing.assert_allclose(out, grid, atol=2e-3)


def test_roundtrip_unnormalized_scales_by_n():
    """DL convention (normalize=false): fft(ifft_unnorm(x)) = N*x."""
    rng = np.random.default_rng(0)
    p = OfdmParams(6)
    m = Ofdm(p)
    grid = _rand_grid(rng, p)
    out = np.asarray(m.rx_sf(m.tx_sf(jnp.asarray(grid)))) / p.symbol_sz
    np.testing.assert_allclose(out, grid, atol=2e-3)


def test_roundtrip_extended_cp():
    rng = np.random.default_rng(1)
    p = OfdmParams(25, CP.EXT)
    m = Ofdm(p, normalize=True)
    grid = _rand_grid(rng, p)
    out = np.asarray(m.rx_sf(m.tx_sf(jnp.asarray(grid))))
    np.testing.assert_allclose(out, grid, atol=2e-3)


def test_roundtrip_half_subcarrier_shift():
    """UL convention: tx freq_shift=+0.5, rx freq_shift=-0.5 (ue_ul.c:61)."""
    rng = np.random.default_rng(2)
    p = OfdmParams(6)
    tx = Ofdm(p, normalize=True, freq_shift=+0.5)
    rx = Ofdm(p, normalize=True, freq_shift=-0.5)
    grid = _rand_grid(rng, p)
    out = np.asarray(rx.rx_sf(tx.tx_sf(jnp.asarray(grid))))
    np.testing.assert_allclose(out, grid, atol=2e-3)


def test_single_subcarrier_is_complex_exponential():
    """Validates the RE->bin mirror map + CP against analytic samples."""
    p = OfdmParams(6)
    m = Ofdm(p, normalize=True)
    n = p.symbol_sz
    half = p.nof_re // 2

    for re_idx, f in [(half, 1), (half - 1, -1), (half + 2, 3)]:
        grid = np.zeros((p.nsymb_sf, p.nof_re), np.complex64)
        grid[0, re_idx] = 1.0
        samples = np.asarray(m.tx_sf(jnp.asarray(grid)))
        cp0 = p.cp_lens_slot()[0]
        t = np.arange(cp0 + n) - cp0
        expect = np.exp(2j * np.pi * f * t / n) / np.sqrt(n)
        np.testing.assert_allclose(samples[: cp0 + n], expect, atol=1e-5)
        assert np.allclose(samples[cp0 + n :], 0, atol=1e-6)


def test_cp_is_cyclic():
    rng = np.random.default_rng(3)
    p = OfdmParams(15)
    m = Ofdm(p)
    samples = np.asarray(m.tx_sf(jnp.asarray(_rand_grid(rng, p))))
    n, cps = p.symbol_sz, p.cp_lens_slot()
    pos = 0
    for cp in cps:  # first slot
        np.testing.assert_allclose(samples[pos : pos + cp], samples[pos + n : pos + cp + n], atol=1e-5)
        pos += cp + n


def test_batched_and_jitted():
    rng = np.random.default_rng(4)
    p = OfdmParams(6)
    m = Ofdm(p, normalize=True)
    grid = _rand_grid(rng, p, batch=(3, 2))  # e.g. [carriers, antennas]
    f = jax.jit(lambda g: m.rx_sf(m.tx_sf(g)))
    out = np.asarray(f(jnp.asarray(grid)))
    assert out.shape == grid.shape
    np.testing.assert_allclose(out, grid, atol=2e-3)

"""CRS / channel estimation / MIMO tests (ch_estimation + mimo test analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.chest import refsignal_dl as rs
from srslte_tpu.phy.chest.chest_dl import ChestDL
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.mimo import (alamouti_decode_2tx, alamouti_encode_2tx,
                                 equalize_mmse, equalize_zf)


def test_crs_positions():
    cell = Cell(n_prb=6, id=1, nof_ports=1)
    syms, ks = rs.crs_re_indices(cell, 0)
    np.testing.assert_array_equal(syms, [0, 4, 7, 11])
    # v_shift = 1 mod 6; symbol 0 uses v=0, symbol 4 uses v=3
    assert ks[0][0] == 1 and ks[1][0] == 4
    assert np.all(np.diff(ks[0]) == 6) and ks.shape == (4, 12)


def test_crs_pilot_values_unit_mod():
    cell = Cell(n_prb=6, id=123)
    p = rs.crs_pilots(cell, sf_idx=0, port=0)
    np.testing.assert_allclose(np.abs(p), 1.0, rtol=1e-6)
    # different subframes give different sequences
    p5 = rs.crs_pilots(cell, sf_idx=5, port=0)
    assert not np.allclose(p, p5)


def test_crs_mask_counts():
    cell = Cell(n_prb=6, id=0, nof_ports=2)
    m = rs.crs_mask(cell)
    # ports 0+1 with pairing: 4 symbols x 4 pilots/PRB... = 4 REs/PRB/CRS-symbol
    assert m[0].sum() == 4 * 6 and m[4].sum() == 4 * 6
    assert m[2].sum() == 0


def test_chest_flat_channel():
    cell = Cell(n_prb=6, id=7, nof_ports=1)
    est = ChestDL(cell, algorithm="average")
    o = cell.ofdm
    h = 0.8 * np.exp(1j * 0.7)
    grid = np.zeros((o.nsymb_sf, o.nof_re), np.complex64)
    syms, ks = rs.crs_re_indices(cell, 0)
    pil = rs.crs_pilots(cell, 0, 0)
    grid[syms[:, None], ks] = pil * h
    ce, info = est.estimate(jnp.asarray(grid), sf_idx=0)
    np.testing.assert_allclose(np.asarray(ce[0]), h, atol=1e-5)
    assert float(info["noise"]) < 1e-8


def test_chest_selective_channel_and_noise():
    """2-tap channel + AWGN: estimate error and noise estimate within bounds."""
    rng = np.random.default_rng(0)
    cell = Cell(n_prb=25, id=3, nof_ports=1)
    o = cell.ofdm
    # channel: h[k] = 1 + 0.5 e^{-j2 pi k tau/N}
    k = np.arange(o.nof_re)
    h = (1.0 + 0.5 * np.exp(-2j * np.pi * k * 4 / o.symbol_sz)).astype(np.complex64)
    sigma = 0.05
    grid = np.zeros((o.nsymb_sf, o.nof_re), np.complex64)
    syms, ks = rs.crs_re_indices(cell, 0)
    pil = rs.crs_pilots(cell, 0, 0)
    grid[syms[:, None], ks] = pil * h[ks]
    grid += sigma * (rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)).astype(np.complex64) / np.sqrt(2)
    for alg in ("average", "interpolate"):
        ce, info = ChestDL(cell, algorithm=alg).estimate(jnp.asarray(grid), 0)
        err = np.mean(np.abs(np.asarray(ce[0, 0]) - h) ** 2) / np.mean(np.abs(h) ** 2)
        assert err < 0.01, (alg, err)
    noise = float(info["noise"])
    assert 0.2 * sigma**2 < noise < 5 * sigma**2


def test_zf_mmse_equalizers():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(100) + 1j * rng.standard_normal(100)).astype(np.complex64)
    h = (0.5 + 1j * 0.3) * np.ones(100, np.complex64)
    y = x * h
    np.testing.assert_allclose(np.asarray(equalize_zf(jnp.asarray(y), jnp.asarray(h))), x, atol=1e-5)
    out = np.asarray(equalize_mmse(jnp.asarray(y), jnp.asarray(h), 1e-6))
    np.testing.assert_allclose(out, x, atol=1e-3)


def test_alamouti_roundtrip():
    rng = np.random.default_rng(2)
    n = 120
    x = ((rng.integers(0, 2, n) * 2 - 1) + 1j * (rng.integers(0, 2, n) * 2 - 1)).astype(np.complex64) / np.sqrt(2)
    tx = np.asarray(alamouti_encode_2tx(jnp.asarray(x)))  # [2, n]
    h0 = (0.9 * np.exp(0.3j)) * np.ones(n, np.complex64)
    h1 = (0.4 * np.exp(-1.1j)) * np.ones(n, np.complex64)
    y = tx[0] * h0 + tx[1] * h1
    out = np.asarray(alamouti_decode_2tx(jnp.asarray(y), jnp.asarray(h0), jnp.asarray(h1)))
    np.testing.assert_allclose(out, x, atol=1e-5)


def test_alamouti_varying_channel():
    """Slowly varying channel across REs still decodes with low error."""
    rng = np.random.default_rng(3)
    n = 600
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64) / np.sqrt(2)
    k = np.arange(n)
    h0 = np.exp(-2j * np.pi * k * 2 / 2048).astype(np.complex64)
    h1 = 0.7 * np.exp(-2j * np.pi * k * 5 / 2048).astype(np.complex64)
    tx = np.asarray(alamouti_encode_2tx(jnp.asarray(x)))
    y = tx[0] * h0 + tx[1] * h1
    out = np.asarray(alamouti_decode_2tx(jnp.asarray(y), jnp.asarray(h0), jnp.asarray(h1)))
    evm = np.sqrt(np.mean(np.abs(out - x) ** 2) / np.mean(np.abs(x) ** 2))
    assert evm < 0.05


def test_wiener_chest_beats_linear_on_selective_channel():
    """Wiener/MMSE freq filter vs linear interp under delay spread + noise,
    compared against the EXACT channel response of the fading model
    (wiener_dl.c analog)."""
    import jax
    from srslte_tpu.phy.channel import FadingChannel, awgn
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.ofdm import Ofdm

    cell = Cell(n_prb=25, id=3, nof_ports=1)
    o = cell.ofdm
    enb = EnbDl(cell)
    g = enb.put_base(enb.empty_grids(), 1)
    s = enb.gen_signal(g)[..., 0, :]
    ch = FadingChannel("etu", doppler_hz=0.0, srate=o.srate, seed=9)
    rx = awgn(jax.random.PRNGKey(1), ch(s), 15.0)
    grid = Ofdm(o, normalize=True).rx_sf(rx)

    # exact H on the grid bins from the channel model itself
    gains = np.asarray(ch.tap_gains(jnp.asarray([0.0])))[0]
    d, _ = ch._taps
    N = o.symbol_sz
    half = o.nof_re // 2
    bins = np.concatenate([np.arange(N - half, N), np.arange(1, half + 1)])
    f = np.where(bins >= N // 2, bins - N, bins) / N
    h_true = (gains[None, :] * np.exp(-2j * np.pi * np.outer(f, d))).sum(1)

    errs = {}
    for algo in ("average", "wiener"):
        ce, _ = ChestDL(cell, algorithm=algo).estimate(grid, 1)
        errs[algo] = float(np.mean(np.abs(np.asarray(ce)[0] - h_true) ** 2))
    assert errs["wiener"] < 0.5 * errs["average"], errs


def test_pdsch_over_etu_with_wiener_chest():
    import jax
    from srslte_tpu.phy.channel import FadingChannel, awgn
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.phch.ra import DlGrant
    from srslte_tpu.phy.ue.ue_dl import UeDl

    cell = Cell(n_prb=25, id=9)
    grant = DlGrant.full(25, 10)  # 16QAM
    pdsch = Pdsch(cell, grant, sf_idx=4, rnti=0x10)
    enb = EnbDl(cell)
    ue = UeDl(cell, chest_algorithm="wiener")
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, (grant.tbs,)).astype(np.uint8)
    g = enb.put_base(enb.empty_grids(), 4)
    g = enb.put_pdsch(g, pdsch, jnp.asarray(bits))
    s = enb.gen_signal(g)[..., 0, :]
    ch = FadingChannel("etu", doppler_hz=5.0, srate=cell.ofdm.srate, seed=4)
    noisy = awgn(jax.random.PRNGKey(7), ch(s), 22.0)
    out, ok, info = ue.decode_pdsch(noisy, pdsch)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), bits)

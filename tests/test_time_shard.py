"""Time-block sharding of the full DL chain with the chest halo exchange.

Reference analog: ue_sync.c streaming context whose channel-tracking state
crosses subframe boundaries; sharded, that state moves over ICI
(parallel/time_shard.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.parallel import make_mesh
from srslte_tpu.parallel.time_shard import TimeShardedDlChain
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.phch.ra import DlGrant


def _fading(x, rng, taps=(1.0, 0.45 * np.exp(0.8j), 0.25 * np.exp(-1.9j)),
            noise=0.02):
    y = np.zeros_like(x)
    for d, t in enumerate(taps):
        y[..., d:] += t * x[..., : x.shape[-1] - d]
    y = y + noise * (rng.standard_normal(y.shape)
                     + 1j * rng.standard_normal(y.shape))
    return jnp.asarray(y.astype(np.complex64))


@pytest.fixture(scope="module")
def chain_and_rx():
    cell = Cell(n_prb=15, id=3, nof_ports=1)
    chain = TimeShardedDlChain(cell, DlGrant.full(15, 10))
    rng = np.random.default_rng(0)
    n_sf = 16
    bits = jnp.asarray(rng.integers(0, 2, (n_sf, chain.tbs))
                       .astype(np.float32))
    rx = _fading(np.asarray(chain.encode(bits)), rng)
    return chain, bits, rx


def test_unsharded_chain_decodes_fading(chain_and_rx):
    chain, bits, rx = chain_and_rx
    out, ok = chain.rx(rx)
    assert bool(np.asarray(ok).all())
    assert np.array_equal(np.asarray(out), np.asarray(bits))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_time_sharded_bit_exact_on_fading(chain_and_rx, n_dev):
    """The sharded chain (chest halo via ppermute) matches unsharded
    bit-exactly on a frequency-selective channel — the VERDICT bar."""
    if len(jax.devices()) < n_dev:
        pytest.skip("needs virtual device mesh")
    chain, bits, rx = chain_and_rx
    b_ref, ok_ref = chain.rx(rx)
    mesh = make_mesh({"t": n_dev})
    b_sh, ok_sh = chain.rx_sharded(rx, mesh)
    assert np.array_equal(np.asarray(ok_ref), np.asarray(ok_sh))
    assert np.array_equal(np.asarray(b_ref), np.asarray(b_sh))


def test_halo_carries_load_bearing_state(chain_and_rx):
    """The smoothed CE at every block-start subframe genuinely depends on
    the neighbor's LS estimate — a dropped halo would change it."""
    from srslte_tpu.phy.ofdm import Ofdm

    chain, bits, rx = chain_and_rx
    n_dev, per = 8, rx.shape[0] // 8
    grids = Ofdm(chain.cell.ofdm, normalize=True).rx_sf(rx)
    sf_mod = jnp.asarray(np.arange(rx.shape[0]) % 10)
    h_full = chain._ls_freq(grids, sf_mod)
    ce_halo = np.asarray(chain._smooth(h_full, h_full[0], True))
    for s in np.arange(1, n_dev) * per:
        # without the halo a block start would self-prime: ce = h[s]
        assert not np.allclose(ce_halo[s], np.asarray(h_full[s])), \
            f"halo CE identical at block start {s}"

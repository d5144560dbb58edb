"""SRS: sounding reference signal (36.211 §5.5.3, refsignal_ul.c SRS parts).

Reference behavior: lib/src/phy/ch_estimation/refsignal_ul.c
(srsran_refsignal_srs_gen) — base sequence r_u,v with cyclic shift
alpha = 2*pi*n_srs/8, transmission comb k_TC (every 2nd subcarrier), last
SC-FDMA symbol of the subframe.

Simplification vs the reference: the SRS bandwidth (m_srs PRB) and frequency
position (k0 PRB) are given directly in the config instead of being derived
from the C_srs/B_srs bandwidth-configuration tables (36.211 tables
5.5.3.2-1..4) — the table derivation is config-plane sugar, the signal math
is identical.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..chest.refsignal_ul import base_sequence
from ..common.params import Cell


@dataclass(frozen=True)
class SrsConfig:
    m_srs: int  # sounding bandwidth in PRB (must be even, >= 4)
    k0_prb: int = 0  # starting PRB of the sounding region
    comb: int = 0  # k_TC in {0, 1}
    n_srs_cs: int = 0  # cyclic shift 0..7

    @property
    def m_sc(self) -> int:
        return self.m_srs * 12 // 2  # comb-2: half the subcarriers


@dataclass(frozen=True)
class Srs:
    cell: Cell
    cfg: SrsConfig

    @functools.cached_property
    def seq(self) -> np.ndarray:
        u = self.cell.id % 30
        alpha = 2 * np.pi * self.cfg.n_srs_cs / 8
        n = np.arange(self.cfg.m_sc)
        # base sequence length is m_sc (=m_srs/2 PRB worth of REs)
        r = base_sequence(u, 0, self.cfg.m_srs // 2)
        return (r * np.exp(1j * alpha * n)).astype(np.complex64)

    @functools.cached_property
    def k_idx(self) -> np.ndarray:
        k0 = self.cfg.k0_prb * 12 + self.cfg.comb
        return (k0 + 2 * np.arange(self.cfg.m_sc)).astype(np.int32)

    def encode(self, grid):
        """Place SRS in the last symbol of grid [..., nsymb_sf, nof_re]."""
        import jax.numpy as jnp

        return grid.at[..., -1, jnp.asarray(self.k_idx)].set(jnp.asarray(self.seq))

    def estimate(self, grid):
        """-> (h [..., m_sc] channel at the comb, noise [...], power [...])."""
        import jax.numpy as jnp

        y = grid[..., -1, jnp.asarray(self.k_idx)]
        h = y * jnp.conj(jnp.asarray(self.seq))
        # neighbor-difference noise estimate
        d = h[..., 1:] - h[..., :-1]
        noise = jnp.mean(jnp.abs(d) ** 2, axis=-1) / 2
        power = jnp.mean(jnp.abs(h) ** 2, axis=-1)
        return h, noise, power

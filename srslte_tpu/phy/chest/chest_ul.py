"""UL channel estimation from PUSCH DMRS (chest_ul.c equivalent).

Reference behavior: lib/src/phy/ch_estimation/chest_ul.c — LS estimate at the
two DMRS symbols, frequency-domain smoothing, linear interpolation across the
subframe, noise estimate from the smoothing residual.

TPU-first: the smoothing is a small depthwise convolution and the time
interpolation a precomputed [nsymb, 2] matmul — the whole estimator is a few
fused VPU ops over [..., 2, M].
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..common.params import Cell
from .refsignal_ul import dmrs_symbol, pusch_dmrs

SMOOTH_TAPS = 5


@dataclass(frozen=True)
class ChestUl:
    cell: Cell

    def estimate(self, grid, sf_idx: int, prb_start: int, m_prb: int,
                 n_dmrs2: int = 0):
        """grid [..., nsymb_sf, nof_re] -> (ce [..., nsymb_sf, M], info).

        ce covers the allocated subcarriers only (M = m_prb*12).
        """
        import jax.numpy as jnp

        o = self.cell.ofdm
        ls = dmrs_symbol(self.cell)
        sym = np.array([ls, o.nsymb_slot + ls])
        k0 = prb_start * 12
        m = m_prb * 12
        pil = jnp.asarray(pusch_dmrs(self.cell, sf_idx, m_prb, n_dmrs2=n_dmrs2))
        y = grid[..., sym, k0 : k0 + m]  # [..., 2, M]
        h_ls = y * jnp.conj(pil)  # unit-amplitude pilots

        # frequency smoothing (moving average, like chest averaging filters)
        w = np.ones(SMOOTH_TAPS, np.float32) / SMOOTH_TAPS
        pad = SMOOTH_TAPS // 2
        hp = jnp.concatenate([h_ls[..., :1].repeat(pad, -1), h_ls,
                              h_ls[..., -1:].repeat(pad, -1)], axis=-1)
        kern = jnp.asarray(w)
        h_sm = sum(hp[..., i : i + m] * kern[i] for i in range(SMOOTH_TAPS))

        noise = jnp.mean(jnp.abs(h_ls - h_sm) ** 2, axis=(-1, -2))
        noise = noise * SMOOTH_TAPS / (SMOOTH_TAPS - 1)  # bias correction

        # linear time interpolation across the subframe between the 2 pilots
        t = (np.arange(o.nsymb_sf) - sym[0]) / (sym[1] - sym[0])
        t = jnp.asarray(t.astype(np.float32))[:, None]
        ce = h_sm[..., 0:1, :] * (1 - t) + h_sm[..., 1:2, :] * t
        return ce, {"noise": noise, "h_dmrs": h_sm}

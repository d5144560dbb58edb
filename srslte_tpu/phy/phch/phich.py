"""PHICH: HARQ indicator channel (36.211 §6.9).

Reference behavior: lib/src/phy/phch/phich.c — BPSK HI spread by SF-4
orthogonal sequences (8 per group: 4 real Walsh x {1, j}), repeated 3x,
scrambled (c_init as PCFICH §6.9.1), mapped to 3 REGs per group — all in
symbol 0 (normal duration) or one per symbol 0/1/2 (extended duration,
geometry from regs.py).

TPU-first: all 8 sequences of all groups encode/decode as one einsum against
the [8, 12] spread matrix; despreading is a matmul, the per-sequence loop in
phich.c disappears.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..common.params import Cell
from ..common.scrambling import pcfich_cinit  # §6.9.1 uses the same c_init form
from ..mimo import alamouti_decode_2tx, alamouti_encode_2tx, equalize_zf
from ..mimo.mimo import alamouti_decode_4tx, alamouti_encode_4tx
from .regs import reg_layout

NSF = 4  # spreading factor, normal CP
NSEQ = 8  # orthogonal sequences per group


@functools.lru_cache(maxsize=1)
def _walsh() -> np.ndarray:
    """[8, 4] complex orthogonal codes (36.211 table 6.9.1-2, normal CP)."""
    w = np.array([[1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1]],
                 np.complex64)
    return np.concatenate([w, 1j * w]).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _spread_matrix(cell_id: int, sf_idx: int) -> np.ndarray:
    """[8, 12]: sequence nseq -> chip values including scrambling.

    d(i) = w(i mod 4) * (1 - 2c(i)) for i = 0..11 (3 repetitions).
    """
    from ..common.sequence import gold_sequence

    c = gold_sequence(pcfich_cinit(sf_idx, cell_id), 12).astype(np.float32)
    s = (1 - 2 * c)[None, :]
    w = np.tile(_walsh(), (1, 3))  # [8, 12]
    return (w * s).astype(np.complex64)


@dataclass(frozen=True)
class Phich:
    cell: Cell
    sf_idx: int

    @functools.cached_property
    def re_idx(self) -> np.ndarray:
        return reg_layout(self.cell).phich_re  # [ngroups, 12]

    @property
    def ngroups(self) -> int:
        return self.re_idx.shape[0]

    def encode(self, grids, ack):
        """ack [..., ngroups, 8] in {-1: off, 0: NACK, 1: ACK} -> grids.

        HI bit b: ACK=1 -> symbol +1, NACK=0 -> -1 (BPSK of b with the
        reference's convention), off -> 0 amplitude.
        """
        import jax.numpy as jnp

        m = jnp.asarray(_spread_matrix(self.cell.id, self.sf_idx))
        amp = jnp.where(ack < 0, 0.0, 1.0).astype(jnp.float32)
        sym = (2.0 * jnp.maximum(ack, 0) - 1.0) * amp  # ±1 or 0
        d = jnp.einsum("...gs,sc->...gc", sym.astype(jnp.complex64), m)
        d = d / np.sqrt(2)  # group power normalization
        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)  # [g, 12]
        flat = grids.reshape(grids.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        if self.cell.nof_ports == 1:
            flat = flat.at[..., 0, idx].add(d)
        elif self.cell.nof_ports == 2:
            tx = alamouti_encode_2tx(d)  # [..., g, 2, 12]
            flat = flat.at[..., 0, idx].add(tx[..., 0, :])
            flat = flat.at[..., 1, idx].add(tx[..., 1, :])
        elif self.cell.nof_ports == 4:
            tx = alamouti_encode_4tx(d)  # [..., g, 4, 12] SFBC-FSTD
            for p in range(4):
                flat = flat.at[..., p, idx].add(tx[..., p, :])
        else:
            raise ValueError(f"bad port count {self.cell.nof_ports}")
        return flat.reshape(grids.shape)

    def decode(self, grid, ce, noise_var=1e-3):
        """-> (ack [..., ngroups, 8] bool, metric float distance)."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        y = grid.reshape(grid.shape[:-2] + (-1,))[..., idx]  # [..., g, 12]
        cef = ce.reshape(ce.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        if self.cell.nof_ports == 1:
            xhat = equalize_zf(y, cef[..., 0, idx])
        elif self.cell.nof_ports == 2:
            xhat = alamouti_decode_2tx(y, cef[..., 0, idx], cef[..., 1, idx])
        else:
            # cef[..., :, idx] is [..., 4, g, 12]; ports must sit at axis -2
            xhat, _ = alamouti_decode_4tx(
                y, jnp.swapaxes(cef[..., :, idx], -3, -2))
        m = jnp.asarray(_spread_matrix(self.cell.id, self.sf_idx))
        corr = jnp.einsum("...gc,sc->...gs", xhat, jnp.conj(m)) / NSF / 3
        metric = corr.real * np.sqrt(2)
        return metric > 0, metric

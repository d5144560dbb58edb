"""PCFICH: CFI indicator channel (36.211 §6.7, 36.212 §5.3.4).

Reference behavior: lib/src/phy/phch/pcfich.c — 32-bit CFI codewords,
scrambling with c_init = (ns/2+1)(2NID+1)*2^9 + NID, QPSK, 4 REG quadruplets
(regs.c geometry), decode by correlation against the 3 codewords (:151).

TPU-first: decode correlates the 32 received LLRs against the whole codebook
with one [3,32] matmul — batched over subframes; no per-codeword loop.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..common.params import Cell
from ..common.scrambling import pcfich_cinit
from ..common.sequence import gold_sequence, gold_sequence_signed
from ..mimo import alamouti_decode_2tx, alamouti_encode_2tx, equalize_zf
from ..mimo.mimo import alamouti_decode_4tx, alamouti_encode_4tx
from ..modem.modem import Modulation, demod_soft, modulate
from .regs import reg_layout

# 36.212 table 5.3.4-1
_CFI_CW = np.array([
    [0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1],
    [1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0],
    [1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1, 0, 1, 1],
], np.uint8)


@functools.lru_cache(maxsize=None)
def _codebook_signed(cell_id: int, sf_idx: int) -> np.ndarray:
    """Scrambled ±1 codebook [3, 32] (for correlation decoding)."""
    c = gold_sequence(pcfich_cinit(sf_idx, cell_id), 32)
    return (1.0 - 2.0 * (_CFI_CW ^ c).astype(np.float32)).astype(np.float32)


@dataclass(frozen=True)
class Pcfich:
    cell: Cell
    sf_idx: int

    @functools.cached_property
    def re_idx(self) -> np.ndarray:
        return reg_layout(self.cell).pcfich_re

    def encode(self, grids, cfi: int):
        """Place the CFI codeword. grids [..., nports, nsym, nre]."""
        import jax.numpy as jnp

        c = gold_sequence(pcfich_cinit(self.sf_idx, self.cell.id), 32)
        bits = jnp.asarray(_CFI_CW[cfi - 1] ^ c)
        sym = modulate(bits, Modulation.QPSK)  # [16]
        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        flat = grids.reshape(grids.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        if self.cell.nof_ports == 1:
            flat = flat.at[..., 0, idx].set(sym)
        elif self.cell.nof_ports == 2:
            tx = alamouti_encode_2tx(sym)
            flat = flat.at[..., 0, idx].set(tx[..., 0, :])
            flat = flat.at[..., 1, idx].set(tx[..., 1, :])
        elif self.cell.nof_ports == 4:
            tx = alamouti_encode_4tx(sym)  # 16 symbols, SFBC-FSTD
            for p in range(4):
                flat = flat.at[..., p, idx].set(tx[..., p, :])
        else:
            raise ValueError(f"bad port count {self.cell.nof_ports}")
        return flat.reshape(grids.shape)

    def decode(self, grid, ce):
        """grid [..., nsym, nre], ce [..., nports, nsym, nre] -> (cfi, corr).

        cfi in {1,2,3}; corr = normalized correlation of the winner.
        """
        import jax.numpy as jnp

        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        y = grid.reshape(grid.shape[:-2] + (-1,))[..., idx]
        cef = ce.reshape(ce.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        if self.cell.nof_ports == 1:
            xhat = equalize_zf(y, cef[..., 0, idx])
        elif self.cell.nof_ports == 2:
            xhat = alamouti_decode_2tx(y, cef[..., 0, idx], cef[..., 1, idx])
        else:
            xhat, _ = alamouti_decode_4tx(y, cef[..., :, idx])
        llr = demod_soft(xhat, Modulation.QPSK)  # [..., 32], positive => bit 1
        cb = jnp.asarray(_codebook_signed(self.cell.id, self.sf_idx))
        corr = -jnp.einsum("...n,cn->...c", llr, cb)  # +1 maps bit0
        best = jnp.argmax(corr, axis=-1)
        norm = jnp.sum(jnp.abs(llr), axis=-1)
        conf = jnp.take_along_axis(corr, best[..., None], -1)[..., 0] / jnp.maximum(norm, 1e-9)
        return (best + 1).astype(jnp.int32), conf

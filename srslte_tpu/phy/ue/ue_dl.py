"""UE downlink receiver composition (ue_dl.c equivalent).

Reference behavior: lib/src/phy/ue/ue_dl.c — srsran_ue_dl_decode_fft_estimate
(:349): OFDM demod + channel estimation; then PDCCH search / PDSCH decode.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...utils.jit import lazy_jit
from ..chest.chest_dl import ChestDL
from ..common.params import Cell
from ..ofdm import Ofdm
from ..phch.pdsch import Pdsch


@dataclass(frozen=True)
class UeDl:
    cell: Cell
    chest_algorithm: str = "average"

    @property
    def ofdm(self) -> Ofdm:
        return Ofdm(self.cell.ofdm, normalize=True)

    @property
    def chest(self) -> ChestDL:
        return ChestDL(self.cell, algorithm=self.chest_algorithm)

    @lazy_jit(static_argnums=(0, 2))
    def fft_estimate(self, samples, sf_idx: int):
        """samples [..., sf_len] -> (grid, ce, info)."""
        grid = self.ofdm.rx_sf(samples)
        ce, info = self.chest.estimate(grid, sf_idx)
        return grid, ce, info

    def decode_pdsch(self, samples, pdsch: Pdsch, n_iter: int = 5):
        grid, ce, info = self.fft_estimate(samples, pdsch.sf_idx)
        bits, ok = pdsch.decode(grid, ce, info["noise"], n_iter=n_iter)
        return bits, ok, info

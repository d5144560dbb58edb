"""eNB downlink subframe composition (enb_dl.c equivalent).

Reference behavior: lib/src/phy/enb/enb_dl.c — put_base (CRS/PSS/SSS/PCFICH/
PHICH, :344), put_pdcch (:372), put_pdsch (:404), gen_signal IFFT (:420).
This version composes per-port RE grids functionally and runs the batched
OFDM modulator; channels are added as they are implemented.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..chest.refsignal_dl import put_crs
from ..common.params import Cell
from ..ofdm import Ofdm
from ..phch.pdsch import Pdsch


@dataclass(frozen=True)
class EnbDl:
    cell: Cell

    @property
    def ofdm(self) -> Ofdm:
        return Ofdm(self.cell.ofdm, normalize=True)

    def empty_grids(self, batch=()):
        o = self.cell.ofdm
        return jnp.zeros(batch + (self.cell.nof_ports, o.nsymb_sf, o.nof_re),
                         jnp.complex64)

    def put_base(self, grids, sf_idx: int):
        """CRS for all ports (PSS/SSS/PBCH when those channels land)."""
        for p in range(self.cell.nof_ports):
            grids = grids.at[..., p, :, :].set(
                put_crs(grids[..., p, :, :], self.cell, sf_idx, p))
        return grids

    def put_pdsch(self, grids, pdsch: Pdsch, bits):
        return pdsch.encode(bits, grids)

    def gen_signal(self, grids):
        """grids [..., nports, nsym, nre] -> samples [..., nports, sf_len]."""
        return self.ofdm.tx_sf(grids)

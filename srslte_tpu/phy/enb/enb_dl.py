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
from ..common.zc import pss_sequence
from ..ofdm import Ofdm
from ..phch.pbch import Mib, Pbch
from ..phch.pcfich import Pcfich
from ..phch.pdcch import Location, Pdcch
from ..phch.pdsch import Pdsch
from ..phch.phich import Phich
from ..sync.sss import sss_sequence


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

    def put_pss_sss(self, grids, sf_idx: int):
        """PSS + SSS per the cell's frame structure (36.211 §6.11).

        FDD (type 1): PSS in the last symbol of slot 0, SSS one symbol
        earlier, subframes 0 and 5.  TDD (type 2): SSS in the LAST symbol
        of subframes 0 and 5, PSS in the THIRD symbol of subframes 1 and 6
        (the DwPTS).  Center 62 subcarriers around DC, port 0 (enb_dl.c:344
        put_base places them once, not per port).
        """
        o = self.cell.ofdm
        mid = o.nof_re // 2
        tdd = self.cell.frame_type == "tdd"
        if tdd:
            if sf_idx % 5 == 0:
                sss = jnp.asarray(sss_sequence(
                    self.cell.n_id_1, self.cell.n_id_2,
                    sf5=(sf_idx == 5)).astype("complex64"))
                grids = grids.at[..., 0, o.nsymb_sf - 1,
                                 mid - 31 : mid + 31].set(sss)
            elif sf_idx % 5 == 1:
                pss = jnp.asarray(pss_sequence(self.cell.n_id_2))
                grids = grids.at[..., 0, 2, mid - 31 : mid + 31].set(pss)
            return grids
        if sf_idx % 5 != 0:
            return grids
        pss = jnp.asarray(pss_sequence(self.cell.n_id_2))
        sss = jnp.asarray(sss_sequence(self.cell.n_id_1, self.cell.n_id_2,
                                       sf5=(sf_idx == 5)).astype("complex64"))
        l_pss = o.nsymb_slot - 1
        l_sss = o.nsymb_slot - 2
        grids = grids.at[..., 0, l_pss, mid - 31 : mid + 31].set(pss)
        grids = grids.at[..., 0, l_sss, mid - 31 : mid + 31].set(sss)
        return grids

    def put_base(self, grids, sf_idx: int):
        """CRS for all ports + PSS/SSS (PBCH when that channel lands)."""
        for p in range(self.cell.nof_ports):
            grids = grids.at[..., p, :, :].set(
                put_crs(grids[..., p, :, :], self.cell, sf_idx, p))
        return self.put_pss_sss(grids, sf_idx)

    def put_pbch(self, grids, mib: Mib):
        """PBCH burst for frame phase mib.sfn%4 (subframe-0 grids only)."""
        return Pbch(self.cell).encode_frame(mib, grids)

    def put_pcfich(self, grids, sf_idx: int, cfi: int):
        return Pcfich(self.cell, sf_idx).encode(grids, cfi)

    def put_phich(self, grids, sf_idx: int, ack):
        return Phich(self.cell, sf_idx).encode(grids, ack)

    def put_pdcch(self, grids, sf_idx: int, cfi: int, payload, rnti: int,
                  loc: Location):
        return Pdcch(self.cell, cfi, sf_idx).encode(grids, payload, rnti, loc)

    def put_pdsch(self, grids, pdsch: Pdsch, bits):
        return pdsch.encode(bits, grids)

    def gen_signal(self, grids):
        """grids [..., nports, nsym, nre] -> samples [..., nports, sf_len]."""
        return self.ofdm.tx_sf(grids)

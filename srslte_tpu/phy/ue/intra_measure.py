"""Neighbor-cell RSRP/RSRQ measurement (intra_measure.cc equivalent).

Reference behavior: srsue/src/phy/scell/intra_measure.cc — ringbuffer
captures measured asynchronously: per neighbor PCI, CRS-based RSRP, wideband
RSSI, RSRQ = N * RSRP / RSSI (36.214 definitions); PSS correlation confirms
presence.

TPU-first: ALL candidate PCIs measure from one captured grid batch in a
single dispatch (the per-cell tables are static gathers); the async thread
becomes "hand a capture to a jitted function".
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ...utils.jit import lazy_jit
from ..chest.refsignal_dl import crs_pilots, crs_re_indices
from ..common.params import Cell, OfdmParams
from ..ofdm import Ofdm


@dataclass(frozen=True)
class IntraMeasure:
    """Measurer for one (n_prb, candidate PCI tuple) bucket."""

    n_prb: int
    pcis: tuple

    @lazy_jit(static_argnums=(0, 2))
    def measure(self, samples, sf_idx: int):
        """samples [..., n_sf, sf_len] aligned captures -> per-PCI metrics.

        Returns dict of arrays keyed rsrp/rsrq/rssi with leading axis =
        candidate PCI index (order of self.pcis), then batch dims.
        """
        import jax.numpy as jnp

        p = OfdmParams(self.n_prb)
        grid = Ofdm(p, normalize=True).rx_sf(samples)  # [..., nsym, nre]
        rssi = jnp.mean(jnp.abs(grid) ** 2, axis=(-1, -2))
        rsrps = []
        for pci in self.pcis:
            cell = Cell(n_prb=self.n_prb, id=pci, nof_ports=1)
            syms, ks = crs_re_indices(cell, 0)
            sfs = sf_idx if isinstance(sf_idx, int) else 0
            refs = jnp.asarray(crs_pilots(cell, sfs, 0))
            rx = grid[..., jnp.asarray(syms)[:, None], jnp.asarray(ks)]
            ls = rx * jnp.conj(refs)
            # coherent average per CRS symbol -> power (rejects noise and
            # other cells' CRS, which are pseudo-random w.r.t. this PCI)
            rsrps.append(jnp.abs(jnp.mean(ls, axis=-1)) ** 2)
        rsrp = jnp.stack([r.mean(axis=-1) for r in rsrps])  # [npci, ...]
        rsrq = self.n_prb * rsrp / jnp.maximum(rssi, 1e-12)
        return {"rsrp": rsrp, "rsrq": rsrq, "rssi": rssi}

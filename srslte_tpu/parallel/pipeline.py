"""Sharded multi-carrier DL pipeline (the cc_worker axis on a mesh).

Reference analog: each sf_worker loops one cc_worker per component carrier
(srsue sf_worker.cc:185-200); carriers are independent.  Here the carrier
axis is a sharded leading array dimension: one jit step encodes/decodes
[n_carriers, n_sf, ...] with carriers partitioned over the mesh, so each
device runs the full per-carrier chain locally and only the scalar BLER
reduction crosses ICI.  Subframe pipelining becomes the n_sf batch axis —
ordering is by construction (no tti_semaphore).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..phy.common.params import Cell
from ..phy.enb.enb_dl import EnbDl
from ..phy.phch.pdsch import Pdsch
from ..phy.phch.ra import DlGrant
from ..phy.ue.ue_dl import UeDl


@dataclass(frozen=True)
class ShardedDlPipeline:
    """Full eNB->UE DL chain for one (cell, grant) bucket over a mesh."""

    cell: Cell
    grant: DlGrant
    sf_idx: int = 4
    rnti: int = 0x46

    def __post_init__(self):
        object.__setattr__(self, "_pdsch",
                           Pdsch(self.cell, self.grant, self.sf_idx, rnti=self.rnti))
        object.__setattr__(self, "_enb", EnbDl(self.cell))
        object.__setattr__(self, "_ue", UeDl(self.cell))

    @property
    def tbs(self) -> int:
        return self.grant.tbs

    def encode(self, bits):
        """bits [..., tbs] -> time samples [..., nports, sf_len]."""
        batch = bits.shape[:-1]
        g = self._enb.put_base(self._enb.empty_grids(batch), self.sf_idx)
        g = self._enb.put_pdsch(g, self._pdsch, bits)
        return self._enb.gen_signal(g)

    def decode(self, samples, n_iter: int = 5):
        """samples [..., sf_len] (1-port combined) -> (bits, ok, bler)."""
        import jax.numpy as jnp

        bits, ok, _ = self._ue.decode_pdsch(samples, self._pdsch, n_iter=n_iter)
        bler = 1.0 - jnp.mean(ok.astype(jnp.float32))  # global: XLA all-reduce
        return bits, ok, bler

    def e2e(self, bits, n_iter: int = 5):
        s = self.encode(bits)
        rx = s[..., 0, :] if self.cell.nof_ports == 1 else s.sum(axis=-2)
        return self.decode(rx, n_iter=n_iter)

    def jit_e2e(self, mesh, axis: str = "carrier"):
        """jit the e2e step with the carrier axis sharded over `mesh`."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh_in = NamedSharding(mesh, P(axis))
        return jax.jit(self.e2e, in_shardings=sh_in,
                       out_shardings=(sh_in, sh_in, NamedSharding(mesh, P())))

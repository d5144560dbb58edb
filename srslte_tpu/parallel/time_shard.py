"""Full DL chain sharded over TIME blocks with a chest halo exchange.

VERDICT/BASELINE north star beyond embarrassing carrier parallelism: a
multi-subframe receive stream is split into contiguous per-device blocks of
whole subframes; OFDM demod and PDSCH decode are local, but the channel
estimator's time-domain smoothing window spans the subframe BEFORE each
block's first subframe — that previous-subframe CRS estimate arrives from
the left neighbor over ICI (jax.lax.ppermute), the chest-stage analog of
the overlap-save halo the PSS search uses (halo.py).

The sharded chain is bit-exact with the unsharded one on fading channels:
both compute ce[i] = (ls[i] + ls[i-1]) / 2 with identical op order; only
where ls[i-1] comes from differs (local slice vs ppermute).

Reference analog: ue_sync.c keeps one streaming context with state crossing
subframe boundaries; here that cross-boundary state is an explicit halo.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..phy.chest.refsignal_dl import crs_pilots, crs_re_indices
from ..phy.common.params import Cell
from ..phy.common.scrambling import pdsch_cinit
from ..phy.common.sequence import gold_sequence
from ..phy.modem.modem import demod_soft, modulate
from ..phy.ofdm import Ofdm
from ..phy.phch.dlsch import dlsch_decode, dlsch_encode
from ..phy.phch.pdsch import Pdsch
from ..phy.phch.ra import DlGrant

GEOMETRY_SF = 4  # plain data subframe (no PSS/SSS/PBCH) donates the RE map


@dataclass(frozen=True)
class TimeShardedDlChain:
    """Multi-subframe DL chain for one (cell, grant) bucket, single port.

    All subframes share the plain-subframe PDSCH geometry; per-subframe
    state (scrambling sequence, CRS values) comes from host-precomputed
    [10, ...] tables indexed by sf mod 10, so one trace serves every
    device position under shard_map.
    """

    cell: Cell
    grant: DlGrant
    rnti: int = 0x46

    def __post_init__(self):
        assert self.cell.nof_ports == 1
        object.__setattr__(self, "_pdsch",
                           Pdsch(self.cell, self.grant, GEOMETRY_SF, cfi=1,
                                 rnti=self.rnti))

    @functools.cached_property
    def _scr_table(self) -> np.ndarray:
        """[10, G] scrambling bits per sf index."""
        g = self._pdsch.cfg.G
        return np.stack([gold_sequence(
            pdsch_cinit(self.rnti, 0, sf, self.cell.id), g)
            for sf in range(10)])

    @functools.cached_property
    def _crs(self) -> tuple[np.ndarray, np.ndarray]:
        """(positions [n_pil], values [10, n_pil]) flat-grid CRS, port 0."""
        o = self.cell.ofdm
        syms, ks = crs_re_indices(self.cell, 0)
        pos = (syms[:, None] * o.nof_re + ks).reshape(-1).astype(np.int32)
        vals = np.stack([crs_pilots(self.cell, sf, 0).reshape(-1)
                         for sf in range(10)]).astype(np.complex64)
        return pos, vals

    @functools.cached_property
    def _pilot_sc(self) -> np.ndarray:
        """Unique pilot subcarriers (both comb offsets), sorted."""
        _, ks = crs_re_indices(self.cell, 0)
        return np.unique(ks).astype(np.int32)

    @property
    def tbs(self) -> int:
        return self.grant.tbs

    @property
    def sf_len(self) -> int:
        return self.cell.ofdm.sf_len

    # -- eNB side -----------------------------------------------------------
    def encode(self, bits, sf0: int = 0):
        """bits [n_sf, tbs] -> samples [n_sf, sf_len] (sf indices sf0+i)."""
        import jax.numpy as jnp

        n_sf = bits.shape[0]
        o = self.cell.ofdm
        sfs = (np.arange(n_sf) + sf0) % 10
        coded = dlsch_encode(bits, self._pdsch.cfg)
        scr = coded.astype(jnp.uint8) ^ jnp.asarray(self._scr_table[sfs],
                                                    jnp.uint8)
        sym = modulate(scr, self.grant.modulation)
        flat = jnp.zeros((n_sf, o.nsymb_sf * o.nof_re), jnp.complex64)
        flat = flat.at[:, jnp.asarray(self._pdsch.re_idx)].set(sym)
        pos, vals = self._crs
        flat = flat.at[:, jnp.asarray(pos)].set(jnp.asarray(vals[sfs]))
        grid = flat.reshape(n_sf, o.nsymb_sf, o.nof_re)
        return Ofdm(o, normalize=True).tx_sf(grid)

    # -- UE side ------------------------------------------------------------
    def _chain_from_ls(self, grids, ls_f, sf_mod, n_iter):
        """Common tail: frequency-interpolated CE + time smoothing done by
        the caller -> equalize + decode.  ls_f [n, nof_re] is the final CE
        in frequency per subframe."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        idx = jnp.asarray(self._pdsch.re_idx)
        flat = grids.reshape(grids.shape[:-2] + (-1,))
        ce_full = jnp.repeat(ls_f[:, None, :], o.nsymb_sf, axis=1)
        y = flat[..., idx]
        h = ce_full.reshape(ce_full.shape[:-2] + (-1,))[..., idx]
        xhat = y * jnp.conj(h) / jnp.maximum(jnp.abs(h) ** 2, 1e-12)
        llr = demod_soft(xhat, self.grant.modulation)
        qm = self.grant.modulation.bits_per_symbol
        w = jnp.repeat(jnp.abs(h) ** 2, qm, axis=-1)
        llr = llr * w
        llr = llr * (1.0 - 2.0 * jnp.asarray(self._scr_table,
                                             jnp.float32)[sf_mod])
        return dlsch_decode(llr, self._pdsch.cfg, n_iter=n_iter)

    def _ls_freq(self, grids, sf_mod):
        """[n, nsym, nre] -> per-subframe frequency LS [n, nof_re]:
        average the CRS symbols per pilot SC, linear-interp across SCs."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        pos, vals = self._crs
        flat = grids.reshape(grids.shape[:-2] + (-1,))
        ls = flat[..., jnp.asarray(pos)] * jnp.conj(jnp.asarray(vals)[sf_mod])
        syms, ks = crs_re_indices(self.cell, 0)
        n_sym = len(syms)
        n_k = ls.shape[-1] // n_sym
        ls_sym = ls.reshape(ls.shape[:-1] + (n_sym, n_k))
        # two comb offsets alternate over CRS symbols: average same-offset
        # symbols, then merge both combs on the subcarrier axis
        merged = jnp.concatenate(
            [(ls_sym[..., 0, :] + ls_sym[..., 2, :]) / 2,
             (ls_sym[..., 1, :] + ls_sym[..., 3, :]) / 2], -1)
        all_ks = np.concatenate([ks[0], ks[1]])
        order = np.argsort(all_ks)
        h_sc = merged[..., jnp.asarray(order)]
        sc = np.sort(all_ks)
        # linear interpolation onto every subcarrier (host-precomputed plan)
        tgt = np.arange(o.nof_re)
        right = np.searchsorted(sc, tgt).clip(1, len(sc) - 1)
        left = right - 1
        t = ((tgt - sc[left]) / (sc[right] - sc[left])).astype(np.float32)
        h_full = (h_sc[..., jnp.asarray(left)] * (1 - t)
                  + h_sc[..., jnp.asarray(right)] * t)
        return h_full

    @staticmethod
    def _smooth(h_full, h_prev, first_is_global):
        """ce[i] = (h[i] + h[i-1]) / 2; the block's first subframe uses
        `h_prev` (neighbor halo), or itself when globally first."""
        import jax.numpy as jnp

        prev = jnp.concatenate([h_prev[None], h_full[:-1]], axis=0)
        prev = jnp.where(first_is_global,
                         prev.at[0].set(h_full[0]), prev)
        return (h_full + prev) / 2

    def rx(self, samples, sf0: int = 0, n_iter: int = 5):
        """Unsharded reference: samples [n_sf, sf_len] -> (bits, ok)."""
        import jax.numpy as jnp

        n_sf = samples.shape[0]
        sf_mod = jnp.asarray((np.arange(n_sf) + sf0) % 10)
        grids = Ofdm(self.cell.ofdm, normalize=True).rx_sf(samples)
        h_full = self._ls_freq(grids, sf_mod)
        ce = self._smooth(h_full, h_full[0], True)
        return self._chain_from_ls(grids, ce, sf_mod, n_iter)

    def rx_sharded(self, samples, mesh, axis: str = "t", sf0: int = 0,
                   n_iter: int = 5):
        """Time-sharded: same computation, chest halo over ICI."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        n_sf = samples.shape[0]
        n_dev = mesh.devices.size
        per = n_sf // n_dev
        assert per * n_dev == n_sf

        def local(x):
            i = jax.lax.axis_index(axis)
            sf_mod = (jnp.arange(per) + i * per + sf0) % 10
            grids = Ofdm(self.cell.ofdm, normalize=True).rx_sf(x)
            h_full = self._ls_freq(grids, sf_mod)
            # halo: my last subframe's LS goes to my RIGHT neighbor
            n = jax.lax.axis_size(axis)
            perm = [(k, (k + 1) % n) for k in range(n)]
            h_prev = jax.lax.ppermute(h_full[-1], axis, perm)
            ce = self._smooth(h_full, h_prev, i == 0)
            return self._chain_from_ls(grids, ce, sf_mod, n_iter)

        # check_vma off: the turbo decoder's lax.scan carries start from
        # unvarying constants, which the varying-manual-axes checker flags
        # even though every shard computes independently
        fn = shard_map(local, mesh=mesh, in_specs=P(axis),
                       out_specs=(P(axis), P(axis)), check_vma=False)
        return jax.jit(fn)(samples)

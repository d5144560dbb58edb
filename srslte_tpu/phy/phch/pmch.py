"""PMCH: multicast channel over MBSFN subframes (36.211 §6.5/§6.10.2).

Reference behavior: lib/src/phy/phch/pmch.c (pmch_put:60, encode/decode,
srsran_configure_pmch:384, scrambling c_init = (sf_idx << 9) + area_id from
sequences.c srsran_sequence_pmch:174) and ch_estimation/refsignal_dl.c
MBSFN reference signals (gen_seq:385: c_init = 512(7(slot+1)+l'+1)(2N+1)+N,
pilot offset 3*(110 - n_prb), 6 pilots/PRB at symbols 2/6/10 of the
extended-CP subframe, subcarrier offsets 0/1/0).

Modeling note: the reference builds MBSFN subframes with a mixed-CP OFDM
(normal-CP control symbols + extended-CP MBSFN region).  Here the whole
subframe lives on the extended-CP grid (12 symbols) with the control region
occupying the first `non_mbsfn_region` symbols — the PMCH RE geometry, RS
pattern, scrambling and TBS math are faithful; only the CP length of the
two control symbols differs.

TPU-first: full-band static RE gathers like pdsch.py; no transmit
diversity (single antenna port 4, pmch.c:339 "No tx diversity in MBSFN").
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ...utils.jit import lazy_jit
from ..common.params import CP, Cell
from ..common.scrambling import scramble_bits, scramble_llr
from ..common.sequence import gold_sequence
from ..mimo import equalize_zf
from ..modem.modem import demod_soft, modulate
from .dlsch import DlschConfig, dlsch_decode, dlsch_encode
from .ra import DlGrant, dl_tbs

MBSFN_RS_SYMBOLS = (2, 6, 10)  # extended-CP subframe symbol indices
_RS_FIDX = (0, 1, 0)  # subcarrier offset per RS symbol (refsignal_dl.c)
MAX_PRB = 110


def pmch_cinit(sf_idx: int, area_id: int) -> int:
    """36.211 §6.5.1 scrambling (sequences.c srsran_sequence_pmch)."""
    return ((sf_idx << 9) + area_id) % (1 << 31)


@functools.lru_cache(maxsize=None)
def mbsfn_rs_values(n_prb: int, area_id: int, sf_idx: int) -> np.ndarray:
    """[3, 6 * n_prb] complex pilots for the three MBSFN RS symbols."""
    out = np.zeros((3, 6 * n_prb), np.complex64)
    for li, nsym in enumerate(MBSFN_RS_SYMBOLS):
        lp = nsym % 6
        slot = 2 * sf_idx + (1 if li else 0)
        c_init = (512 * (7 * (slot + 1) + lp + 1) * (2 * area_id + 1)
                  + area_id) % (1 << 31)
        c = gold_sequence(c_init, 2 * 6 * MAX_PRB).astype(np.float32)
        mp = np.arange(6 * n_prb) + 3 * (MAX_PRB - n_prb)
        out[li] = ((1 - 2 * c[2 * mp]) + 1j * (1 - 2 * c[2 * mp + 1])) / np.sqrt(2)
    return out


@functools.lru_cache(maxsize=None)
def mbsfn_rs_subcarriers(n_prb: int) -> np.ndarray:
    """[3, 6 * n_prb] subcarrier index per pilot."""
    base = 2 * np.arange(6 * n_prb)
    return np.stack([base + f for f in _RS_FIDX]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def pmch_re_indices(cell: Cell, non_mbsfn_region: int = 2) -> np.ndarray:
    """Flat ext-CP-grid indices of PMCH REs (full band, RS punctured)."""
    assert cell.cp is CP.EXT, "MBSFN region uses extended CP"
    o = cell.ofdm
    rs_sc = {s: set(mbsfn_rs_subcarriers(cell.n_prb)[i].tolist())
             for i, s in enumerate(MBSFN_RS_SYMBOLS)}
    idx = []
    for l in range(non_mbsfn_region, o.nsymb_sf):
        ks = np.arange(o.nof_re)
        if l in rs_sc:
            keep = np.array([k not in rs_sc[l] for k in ks])
            ks = ks[keep]
        idx.append(l * o.nof_re + ks)
    return np.concatenate(idx).astype(np.int32)


@dataclass(frozen=True)
class Pmch:
    """PMCH processor for one (cell, area, sf, mcs) bucket.

    The grant is always full-band single-TB (srsran_configure_pmch).
    """

    cell: Cell
    area_id: int
    sf_idx: int
    mcs: int
    non_mbsfn_region: int = 2

    def __post_init__(self):
        assert self.cell.cp is CP.EXT

    @functools.cached_property
    def grant(self) -> DlGrant:
        return DlGrant.full(self.cell.n_prb, self.mcs)

    @functools.cached_property
    def re_idx(self) -> np.ndarray:
        return pmch_re_indices(self.cell, self.non_mbsfn_region)

    @functools.cached_property
    def cfg(self) -> DlschConfig:
        qm = self.grant.modulation.bits_per_symbol
        return DlschConfig(tbs=dl_tbs(self.mcs, self.cell.n_prb),
                           G=len(self.re_idx) * qm, Qm=qm, rv=0)

    @property
    def cinit(self) -> int:
        return pmch_cinit(self.sf_idx, self.area_id)

    def put_rs(self, grids):
        """Write the MBSFN reference signals (port 4)."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        vals = jnp.asarray(mbsfn_rs_values(self.cell.n_prb, self.area_id,
                                           self.sf_idx))
        scs = mbsfn_rs_subcarriers(self.cell.n_prb)
        flat = grids.reshape(grids.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        for i, l in enumerate(MBSFN_RS_SYMBOLS):
            flat = flat.at[..., l * o.nof_re + jnp.asarray(scs[i])].set(vals[i])
        return flat.reshape(grids.shape)

    def encode(self, bits, grids):
        """bits [..., tbs] -> grids [..., nsym_sf, nof_re] with PMCH + RS."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        coded = dlsch_encode(bits, self.cfg)
        scr = scramble_bits(coded, self.cinit)
        sym = modulate(scr, self.grant.modulation)
        flat = grids.reshape(grids.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        flat = flat.at[..., jnp.asarray(self.re_idx)].set(sym)
        return self.put_rs(flat.reshape(grids.shape))

    def chest(self, grid):
        """LS at the MBSFN RS -> (ce [nsym, nof_re], noise_var)."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        vals = jnp.asarray(mbsfn_rs_values(self.cell.n_prb, self.area_id,
                                           self.sf_idx))
        scs = mbsfn_rs_subcarriers(self.cell.n_prb)
        ls = []
        for i, l in enumerate(MBSFN_RS_SYMBOLS):
            ls.append(grid[..., l, :][..., jnp.asarray(scs[i])]
                      * jnp.conj(vals[i]))
        ls = jnp.stack(ls, axis=-2)  # [..., 3, 6*n_prb]
        h_f = ls.mean(axis=-2)  # time-average (MBSFN channels are long but
        # static within a subframe at these tests' scope)
        # every-other-subcarrier -> full band linear interp
        nxt = jnp.concatenate([h_f[..., 1:], h_f[..., -1:]], axis=-1)
        ce_pairs = jnp.stack([h_f, (h_f + nxt) / 2], axis=-1)
        ce = ce_pairs.reshape(ce_pairs.shape[:-2] + (-1,))[..., : o.nof_re]
        noise = jnp.mean(jnp.abs(ls - h_f[..., None, :]) ** 2)
        ce_sf = jnp.broadcast_to(ce[..., None, :],
                                 ce.shape[:-1] + (o.nsymb_sf, o.nof_re))
        return ce_sf, jnp.maximum(noise, 1e-9)

    @lazy_jit(static_argnums=(0,), static_argnames=("n_iter",))
    def decode(self, grid, n_iter: int = 5):
        """grid [..., nsym_sf, nof_re] -> (bits, crc_ok)."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        ce, noise = self.chest(grid)
        idx = jnp.asarray(self.re_idx)
        y = grid.reshape(grid.shape[:-2] + (-1,))[..., idx]
        h = ce.reshape(ce.shape[:-2] + (-1,))[..., idx]
        xhat = equalize_zf(y, h)
        w = jnp.abs(h) ** 2 / noise
        llr = demod_soft(xhat, self.grant.modulation)
        qm = self.grant.modulation.bits_per_symbol
        llr = llr * jnp.repeat(w, qm, axis=-1)
        llr = scramble_llr(llr, self.cinit)
        return dlsch_decode(llr, self.cfg, n_iter=n_iter)

"""PDSCH physical channel processor (36.211 §6.4, pdsch.c equivalent).

Reference behavior: lib/src/phy/phch/pdsch.c (srsran_pdsch_encode:1017,
srsran_pdsch_decode:788) and prb_dl.c RE mapping.  Encode: DL-SCH coding ->
scrambling -> modulation -> (layer map/precode) -> RE mapping.  Decode:
RE extraction -> equalize -> soft demod -> descramble -> DL-SCH decode.

TPU-first: the RE map (around CRS / control region / PBCH / sync) is a static
gather index per (cell, grant, sf class, cfi) bucket, so a whole subframe's
PDSCH moves with two gathers; the rest is batched VPU/MXU work.  The
reference's per-PRB copy loops (prb_dl.c) disappear.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ...utils.jit import lazy_jit
from ..chest.refsignal_dl import crs_mask
from ..common.params import Cell
from ..common.scrambling import pdsch_cinit, scramble_bits, scramble_llr
from ..mimo import alamouti_decode_2tx, alamouti_encode_2tx, equalize_zf
from ..mimo.mimo import (alamouti_decode_4tx, alamouti_encode_4tx,
                         mmse_sm_2layer, mmse_sm_4port, precode_sm_2layer,
                         precode_sm_4port)
from ..modem.modem import demod_soft, modulate
from .dlsch import DlschConfig, dlsch_decode, dlsch_encode
from .ra import DlGrant
from .regs import nof_ctrl_symbols


def sf_flags(sf_idx: int) -> tuple[bool, bool]:
    """(has_pss_sss, has_pbch) for FDD (36.211 §6.11/6.6)."""
    return (sf_idx % 5 == 0, sf_idx == 0)


@functools.lru_cache(maxsize=None)
def reserved_mask(cell: Cell, cfi: int, has_pss_sss: bool, has_pbch: bool) -> np.ndarray:
    """[nsym_sf, nof_re] True where PDSCH must NOT map.

    `cfi` is the CFI value; narrow cells (<=10 PRB) spend cfi+1 symbols on
    control (36.212 §5.3.4, regs.c nof_ctrl_symbols).
    """
    o = cell.ofdm
    m = crs_mask(cell).copy()
    m[: nof_ctrl_symbols(cell, cfi), :] = True  # control region
    mid = o.nof_re // 2
    if has_pss_sss:
        # PSS symbol 6, SSS symbol 5 (normal CP slot 0), center 72 subcarriers
        nsym_slot = o.nsymb_slot
        m[nsym_slot - 1, mid - 36 : mid + 36] = True
        m[nsym_slot - 2, mid - 36 : mid + 36] = True
    if has_pbch:
        # PBCH: slot 1 symbols 0..3, center 72 subcarriers
        for l in range(4):
            m[o.nsymb_slot + l, mid - 36 : mid + 36] = True
    return m


@functools.lru_cache(maxsize=None)
def pdsch_re_indices(cell: Cell, prb_mask: tuple, cfi: int,
                     has_pss_sss: bool, has_pbch: bool,
                     prb_mask_slot1: tuple | None = None,
                     last_symbol: int | None = None) -> np.ndarray:
    """Flattened grid indices (sym*nof_re + k), frequency-first then symbol.

    `prb_mask_slot1` (distributed-VRB slot hopping, 36.211 §6.2.3.2) selects
    a different PRB set for the odd slot's symbols; None = same both slots.
    `last_symbol` truncates the mapping (TDD DwPTS: only the first
    `nof_dw` symbols of a special subframe carry PDSCH).
    """
    o = cell.ofdm
    res = reserved_mask(cell, cfi, has_pss_sss, has_pbch)

    def sc_mask(mask):
        sc = np.zeros(o.nof_re, bool)
        for i, used in enumerate(mask):
            if used:
                sc[i * 12 : (i + 1) * 12] = True
        return sc

    sc0 = sc_mask(prb_mask)
    sc1 = sc0 if prb_mask_slot1 is None else sc_mask(prb_mask_slot1)
    n_sym = o.nsymb_sf if last_symbol is None else min(last_symbol, o.nsymb_sf)
    idx = []
    for l in range(n_sym):
        sc = sc0 if l < o.nsymb_slot else sc1
        ks = np.where(sc & ~res[l])[0]
        idx.append(l * o.nof_re + ks)
    return np.concatenate(idx).astype(np.int32)


def nof_re_pdsch(cell: Cell, grant: DlGrant, sf_idx: int, cfi: int,
                 last_symbol: int | None = None) -> int:
    ps, pb = sf_flags(sf_idx)
    return len(pdsch_re_indices(cell, grant.prb_mask, cfi, ps, pb,
                                grant.prb_mask_slot1, last_symbol))


def dlsch_config(cell: Cell, grant: DlGrant, sf_idx: int, cfi: int,
                 last_symbol: int | None = None) -> DlschConfig:
    n_re = nof_re_pdsch(cell, grant, sf_idx, cfi, last_symbol)
    return DlschConfig(tbs=grant.tbs, G=n_re * grant.modulation.bits_per_symbol,
                       Qm=grant.modulation.bits_per_symbol, rv=grant.rv)


@dataclass(frozen=True)
class Pdsch:
    """PDSCH processor for one (cell, grant, sf_idx, cfi, rnti) bucket."""

    cell: Cell
    grant: DlGrant
    sf_idx: int
    cfi: int = 1
    rnti: int = 0x1234
    # TDD special subframe: PDSCH maps only to the DwPTS symbols
    # (SPECIAL_SF_SYMBOLS[ss_config][0]); pair with grant.is_dwpts for the
    # 0.75-scaled TBS (36.213 §7.1.7)
    dwpts_symbols: int | None = None

    def __post_init__(self):
        # see Pdcch: extended-duration PHICH in symbols 1/2 would collide
        # with PDSCH REs mapped from a smaller control region
        if self.cell.phich_length == "ext" and self.cfi < 3:
            raise ValueError("extended PHICH duration requires CFI >= 3")

    @functools.cached_property
    def cfg(self) -> DlschConfig:
        return dlsch_config(self.cell, self.grant, self.sf_idx, self.cfi,
                            self.dwpts_symbols)

    @functools.cached_property
    def re_idx(self) -> np.ndarray:
        ps, pb = sf_flags(self.sf_idx)
        return pdsch_re_indices(self.cell, self.grant.prb_mask, self.cfi, ps, pb,
                                self.grant.prb_mask_slot1, self.dwpts_symbols)

    @functools.cached_property
    def _map_inverse(self) -> np.ndarray:
        """Gather map realizing the RE scatter: out[i] = concat(grid, sym)[inv[i]].

        TPU idiom: scatter (`.at[idx].set`) lowers to serialized updates;
        a gather over [grid | symbols] with a precomputed inverse permutation
        is one fast vectorized op."""
        o = self.cell.ofdm
        n = o.nsymb_sf * o.nof_re
        inv = np.arange(n, dtype=np.int64)
        inv[self.re_idx] = n + np.arange(len(self.re_idx))
        return inv.astype(np.int32)

    @property
    def cinit(self) -> int:
        return pdsch_cinit(self.rnti, 0, self.sf_idx, self.cell.id)

    # -- eNB side -----------------------------------------------------------
    def encode(self, bits, grids):
        """bits [..., tbs] -> grids with PDSCH REs filled.

        grids: [..., nports, nsym_sf, nof_re] complex64 per-port RE grids.
        TM1 (1 port) or TM2 SFBC (2 ports).
        """
        import jax.numpy as jnp

        coded = dlsch_encode(bits, self.cfg)
        scr = scramble_bits(coded, self.cinit)
        sym = modulate(scr, self.grant.modulation)
        o = self.cell.ofdm
        inv = jnp.asarray(self._map_inverse)
        shape = grids.shape[:-2] + (o.nsymb_sf * o.nof_re,)
        flat = grids.reshape(shape)
        if self.cell.nof_ports == 1:
            flat = flat.at[..., 0, :].set(
                jnp.concatenate([flat[..., 0, :], sym], axis=-1)[..., inv])
        elif self.cell.nof_ports in (2, 4):
            np_ = self.cell.nof_ports
            tx = (alamouti_encode_2tx(sym) if np_ == 2
                  else alamouti_encode_4tx(sym))  # [..., nports, n]
            for p in range(np_):
                flat = flat.at[..., p, :].set(
                    jnp.concatenate([flat[..., p, :], tx[..., p, :]],
                                    axis=-1)[..., inv])
        else:
            raise NotImplementedError
        return flat.reshape(grids.shape)

    # -- UE side ------------------------------------------------------------
    @lazy_jit(static_argnums=(0,), static_argnames=("n_iter",))
    def decode(self, grid, ce, noise_var, n_iter: int = 5):
        """grid [..., nsym, nre], ce [..., nports, nsym, nre] -> (bits, crc_ok).

        Equalizes (MMSE for 1 port, SFBC combine for 2), demodulates with
        noise-scaled LLRs, descrambles and runs DL-SCH decoding.
        """
        import jax.numpy as jnp

        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        y = grid.reshape(grid.shape[:-2] + (o.nsymb_sf * o.nof_re,))[..., idx]
        cef = ce.reshape(ce.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        nv = jnp.asarray(noise_var)
        if nv.ndim:
            nv = nv[..., None]  # broadcast over REs
        if self.cell.nof_ports == 1:
            h = cef[..., 0, idx]
            xhat = equalize_zf(y, h)
            gain = jnp.abs(h) ** 2  # per-RE reliability after ZF
        elif self.cell.nof_ports == 2:
            h0, h1 = cef[..., 0, idx], cef[..., 1, idx]
            xhat = alamouti_decode_2tx(y, h0, h1)
            gain = (jnp.abs(h0) ** 2 + jnp.abs(h1) ** 2) / 2
        elif self.cell.nof_ports == 4:
            xhat, gain = alamouti_decode_4tx(y, cef[..., idx])
        else:
            raise NotImplementedError
        # weight LLRs by per-RE post-equalization SNR (max-log optimal scaling)
        w = gain / jnp.maximum(nv, 1e-9)
        llr = demod_soft(xhat, self.grant.modulation)
        qm = self.grant.modulation.bits_per_symbol
        wq = jnp.repeat(w, qm, axis=-1)
        llr = llr * wq
        llr = scramble_llr(llr, self.cinit)
        return dlsch_decode(llr, self.cfg, n_iter=n_iter)


@dataclass(frozen=True)
class PdschSm(Pdsch):
    """PDSCH with 2-layer spatial multiplexing (TM3/TM4, 2 codewords).

    Reference behavior: pdsch.c 2-TB path + precoding.c CDD/PMI kernels.
    pmi=None selects TM3 large-delay CDD; pmi in {0,1,2} selects the 2-port
    codebook entry (TM4).  Requires cell.nof_ports == 2 and a 2-RX-antenna
    receiver.
    """

    pmi: int | None = None
    # Second-TB grant (same PRB set, its own MCS/RV) for per-TB link
    # adaptation as signaled by DCI 2/2A (dci.c tb[1]); None = same as TB0.
    grant1: DlGrant | None = None

    def __post_init__(self):
        assert self.cell.nof_ports == 2, "2-layer SM needs 2 TX ports"
        if self.grant1 is not None:
            assert self.grant1.prb_mask == self.grant.prb_mask

    def cinit_q(self, q: int) -> int:
        return pdsch_cinit(self.rnti, q, self.sf_idx, self.cell.id)

    def cfg_q(self, q: int) -> DlschConfig:
        if q == 0 or self.grant1 is None:
            return self.cfg
        return dlsch_config(self.cell, self.grant1, self.sf_idx, self.cfi)

    def grant_q(self, q: int) -> DlGrant:
        return self.grant if (q == 0 or self.grant1 is None) else self.grant1

    # -- eNB side -----------------------------------------------------------
    @lazy_jit(static_argnums=(0,))
    def encode2(self, bits0, bits1, grids):
        """Two transport blocks -> 2 layers -> 2 ports."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        layers = []
        for q, bits in enumerate((bits0, bits1)):
            coded = dlsch_encode(bits, self.cfg_q(q))
            scr = scramble_bits(coded, self.cinit_q(q))
            layers.append(modulate(scr, self.grant_q(q).modulation))
        x = jnp.stack(layers, axis=-2)  # [..., 2, n]
        ports = precode_sm_2layer(x, self.pmi)  # [..., 2, n]
        flat = grids.reshape(grids.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        flat = flat.at[..., 0, idx].set(ports[..., 0, :])
        flat = flat.at[..., 1, idx].set(ports[..., 1, :])
        return flat.reshape(grids.shape)

    # -- UE side ------------------------------------------------------------
    @lazy_jit(static_argnums=(0,), static_argnames=("n_iter",))
    def decode2(self, grids_rx, ce, noise_var, n_iter: int = 5):
        """grids_rx [2rx, nsym, nre], ce [2rx, 2tx, nsym, nre] ->
        ((bits0, ok0), (bits1, ok1))."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        y = grids_rx.reshape(grids_rx.shape[:-2] + (-1,))[..., idx]  # [2, n]
        h = ce.reshape(ce.shape[:-2] + (-1,))[..., idx]  # [2, 2, n]
        nv = jnp.mean(jnp.asarray(noise_var))
        xhat, gain = mmse_sm_2layer(y, h, nv[None], self.pmi)
        outs = []
        for q in range(2):
            mod = self.grant_q(q).modulation
            llr = demod_soft(xhat[..., q, :], mod)
            w = gain[..., q, :] / jnp.maximum(nv, 1e-9)
            llr = llr * jnp.repeat(w, mod.bits_per_symbol, axis=-1)
            llr = scramble_llr(llr, self.cinit_q(q))
            outs.append(dlsch_decode(llr, self.cfg_q(q), n_iter=n_iter))
        return tuple(outs)


@dataclass(frozen=True)
class PdschSm4(Pdsch):
    """PDSCH with 4-layer spatial multiplexing (4 TX ports, 2 codewords).

    Layer mapping per 36.211 table 6.3.3.2-1 (2 CW / 4 layers): codeword q
    feeds layers 2q and 2q+1 alternately, so each codeword carries
    2 * nof_re symbols.  pmi=None selects 4-port large-delay CDD (TM3-style
    rank 4); pmi in 0..15 the 36.211 Householder codebook entry (TM4).
    Beyond the reference's 2x2 ceiling (precoding.c srsran_precoding_cdd
    rejects 4 ports); needed for the SURVEY §6 peak-rate point.
    """

    pmi: int | None = None
    grant1: DlGrant | None = None

    def __post_init__(self):
        assert self.cell.nof_ports == 4, "4-layer SM needs 4 TX ports"
        if self.grant1 is not None:
            assert self.grant1.prb_mask == self.grant.prb_mask

    def cinit_q(self, q: int) -> int:
        return pdsch_cinit(self.rnti, q, self.sf_idx, self.cell.id)

    def grant_q(self, q: int) -> DlGrant:
        return self.grant if (q == 0 or self.grant1 is None) else self.grant1

    def cfg_q(self, q: int) -> DlschConfig:
        g = self.grant_q(q)
        n_re = nof_re_pdsch(self.cell, g, self.sf_idx, self.cfi)
        qm = g.modulation.bits_per_symbol
        return DlschConfig(tbs=g.tbs, G=2 * n_re * qm, Qm=qm, rv=g.rv)

    # -- eNB side -----------------------------------------------------------
    @lazy_jit(static_argnums=(0,))
    def encode2(self, bits0, bits1, grids):
        """Two transport blocks -> 4 layers -> 4 ports."""
        import jax.numpy as jnp

        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        layers = []
        for q, bits in enumerate((bits0, bits1)):
            coded = dlsch_encode(bits, self.cfg_q(q))
            scr = scramble_bits(coded, self.cinit_q(q))
            sym = modulate(scr, self.grant_q(q).modulation)  # [..., 2*n_re]
            layers.append(sym[..., 0::2])
            layers.append(sym[..., 1::2])
        x = jnp.stack(layers, axis=-2)  # [..., 4, n_re]
        ports = precode_sm_4port(x, self.pmi)  # [..., 4, n_re]
        flat = grids.reshape(grids.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        for p in range(4):
            flat = flat.at[..., p, idx].set(ports[..., p, :])
        return flat.reshape(grids.shape)

    # -- UE side ------------------------------------------------------------
    @lazy_jit(static_argnums=(0,), static_argnames=("n_iter",))
    def decode2(self, grids_rx, ce, noise_var, n_iter: int = 5):
        """grids_rx [4rx, nsym, nre], ce [4rx, 4tx, nsym, nre] ->
        ((bits0, ok0), (bits1, ok1))."""
        import jax.numpy as jnp

        idx = jnp.asarray(self.re_idx)
        y = grids_rx.reshape(grids_rx.shape[:-2] + (-1,))[..., idx]
        h = ce.reshape(ce.shape[:-2] + (-1,))[..., idx]  # [4, 4, n]
        nv = jnp.mean(jnp.asarray(noise_var))
        xhat, gain = mmse_sm_4port(y, h, nv[None], self.pmi, n_layers=4)
        outs = []
        for q in range(2):
            # de-map layers 2q, 2q+1 back into the codeword symbol stream
            sym = jnp.stack([xhat[..., 2 * q, :], xhat[..., 2 * q + 1, :]],
                            axis=-1).reshape(xhat.shape[:-2] + (-1,))
            g = jnp.stack([gain[..., 2 * q, :], gain[..., 2 * q + 1, :]],
                          axis=-1).reshape(xhat.shape[:-2] + (-1,))
            mod = self.grant_q(q).modulation
            llr = demod_soft(sym, mod)
            w = g / jnp.maximum(nv, 1e-9)
            llr = llr * jnp.repeat(w, mod.bits_per_symbol, axis=-1)
            llr = scramble_llr(llr, self.cinit_q(q))
            outs.append(dlsch_decode(llr, self.cfg_q(q), n_iter=n_iter))
        return tuple(outs)

"""Sidelink channels PSBCH / PSCCH / PSSCH, TM1/2 normal CP (36.211 §9).

Reference behavior: lib/src/phy/phch/psbch.c (encode:195 — CRC16, K=7 TBCC,
rate match, PUSCH-style channel interleaver, N_sl_id scrambling, QPSK, DFT
precoding, 7-of-8-symbol mapping), pscch.c (SCI + CRC16, seed-510
scrambling, 1 PRB), pssch.c (turbo DL-SCH-style coding with
c_init = N_x_id*2^14 + (sf mod 10)*2^9 + 510), sci.c (SCI format 0 codec).

TPU-first: per-channel geometry is a host gather plan; each encode/decode
is a handful of batched device ops (conv/turbo codecs shared with the LTE
UL stack).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import numpy as np

from ..common.sequence import gold_sequence, gold_sequence_signed
from ..fec.convolutional import (conv_encode, rm_conv_rx, rm_conv_tx,
                                 viterbi_decode)
from ..fec.crc import LTE_CRC16, crc_bits, crc_ok_device
from ..mimo import equalize_zf
from ..modem.modem import Modulation, demod_soft, modulate
from ..phch.dft_precoding import dft_deprecode, dft_precode
from ..phch.dlsch import DlschConfig, dlsch_decode, dlsch_encode
from ..phch.pusch import interleaver_indices
from .common import (NRE, PSBCH_DATA_SYMS, PSBCH_E_SYMS, PSCCH_DATA_SYMS,
                     PSSCH_DATA_SYMS, SL_DMRS_SYMS, SL_E_SYMS, psbch_dmrs,
                     pscch_dmrs, pssch_dmrs)

MIB_SL_LEN = 40
SCI_CRC_LEN = 16
PSCCH_SEED = 510


@dataclass(frozen=True)
class MibSl:
    """MasterInformationBlock-SL essentials (36.331; TM1/2, 40 bits)."""

    bandwidth: int = 0  # 3 bits (sl-Bandwidth index)
    tdd_config: int = 0  # 3 bits
    direct_frame: int = 0  # 10 bits
    direct_subframe: int = 0  # 4 bits
    in_coverage: int = 0  # 1 bit
    reserved: int = 0  # 19 bits

    def pack(self) -> np.ndarray:
        bits = np.zeros(MIB_SL_LEN, np.uint8)
        pos = 0
        for val, width in ((self.bandwidth, 3), (self.tdd_config, 3),
                           (self.direct_frame, 10), (self.direct_subframe, 4),
                           (self.in_coverage, 1), (self.reserved, 19)):
            for i in range(width):
                bits[pos + i] = (val >> (width - 1 - i)) & 1
            pos += width
        return bits

    @staticmethod
    def unpack(bits: np.ndarray) -> "MibSl":
        vals, pos = [], 0
        for width in (3, 3, 10, 4, 1, 19):
            v = 0
            for i in range(width):
                v = (v << 1) | int(bits[pos + i])
            vals.append(v)
            pos += width
        return MibSl(*vals)


def _sym_grid_idx(prb0: int, n_prb: int, syms, grid_nre: int) -> np.ndarray:
    """Flat [nsym*grid_nre] indices of (syms x PRB range), symbol-major."""
    k = prb0 * NRE + np.arange(n_prb * NRE)
    return (np.asarray(syms)[:, None] * grid_nre + k[None, :]
            ).reshape(-1).astype(np.int32)


@dataclass(frozen=True)
class Psbch:
    """PSBCH processor (center 6 PRB of the sync subframe)."""

    n_sl_id: int
    grid_prb: int = 6  # grid bandwidth in PRB

    @property
    def E(self) -> int:
        return 2 * PSBCH_E_SYMS * 6 * NRE

    @functools.cached_property
    def _interleave(self) -> np.ndarray:
        return interleaver_indices(self.E, 2, PSBCH_E_SYMS)

    @functools.cached_property
    def _geom(self) -> tuple[np.ndarray, np.ndarray]:
        nre = self.grid_prb * NRE
        prb0 = self.grid_prb // 2 - 3
        return (_sym_grid_idx(prb0, 6, PSBCH_DATA_SYMS, nre),
                _sym_grid_idx(prb0, 6, SL_DMRS_SYMS, nre))

    def encode(self, mib: MibSl, grid):
        """grid [..., 14, grid_prb*12] gains PSBCH data + DMRS."""
        import jax.numpy as jnp

        msg = np.concatenate([mib.pack(),
                              crc_bits(mib.pack(), *LTE_CRC16)])
        k = MIB_SL_LEN + 16
        coded = rm_conv_tx(conv_encode(jnp.asarray(msg), k), self.E)
        il = jnp.asarray(self._interleave)
        coded = coded[..., il]
        scr = coded ^ jnp.asarray(gold_sequence(self.n_sl_id, self.E))
        sym = modulate(scr, Modulation.QPSK)  # [E/2]
        sym = sym.reshape(PSBCH_E_SYMS, 6 * NRE)
        freq = dft_precode(sym)[: len(PSBCH_DATA_SYMS)]  # drop virtual sym
        data_idx, dmrs_idx = self._geom
        flat = grid.reshape(grid.shape[:-2] + (-1,))
        flat = flat.at[..., jnp.asarray(data_idx)].set(freq.reshape(-1))
        dm = psbch_dmrs(self.n_sl_id)
        flat = flat.at[..., jnp.asarray(dmrs_idx)].set(
            jnp.asarray(dm.reshape(-1)))
        return flat.reshape(grid.shape)

    def decode(self, grid):
        """-> (ok, MibSl)."""
        import jax.numpy as jnp

        data_idx, dmrs_idx = self._geom
        flat = grid.reshape(grid.shape[:-2] + (-1,))
        dm = psbch_dmrs(self.n_sl_id)
        ls = flat[..., jnp.asarray(dmrs_idx)] * jnp.conj(
            jnp.asarray(dm.reshape(-1)))
        h = jnp.mean(ls, axis=-1)  # flat estimate over the 6 PRB
        y = flat[..., jnp.asarray(data_idx)]
        xt = equalize_zf(y, h[..., None])
        sym = dft_deprecode(xt.reshape(xt.shape[:-1]
                                       + (len(PSBCH_DATA_SYMS), 6 * NRE)))
        sym = sym.reshape(xt.shape[:-1] + (-1,))
        llr = demod_soft(sym, Modulation.QPSK)
        # pad the untransmitted virtual symbol with zero LLRs
        pad = jnp.zeros(llr.shape[:-1] + (self.E - llr.shape[-1],),
                        llr.dtype)
        llr = jnp.concatenate([llr, pad], -1)
        llr = llr * jnp.asarray(gold_sequence_signed(self.n_sl_id, self.E))
        inv = np.argsort(self._interleave)
        llr = llr[..., jnp.asarray(inv)]
        k = MIB_SL_LEN + 16
        de_rm = rm_conv_rx(llr, 3 * k)
        bits = viterbi_decode(de_rm[None], k)[0]
        ok = crc_ok_device(bits, *LTE_CRC16)
        return bool(np.asarray(ok)), MibSl.unpack(np.asarray(bits)[:MIB_SL_LEN])


@dataclass(frozen=True)
class Sci0:
    """SCI format 0 (36.212 §5.4.3.1, sci.c:59)."""

    riv: int
    trp_idx: int = 0  # 7 bits
    mcs: int = 0  # 5 bits
    timing_advance: int = 0  # 11 bits
    group_dst_id: int = 0  # 8 bits
    hopping: int = 0


def sci0_size(n_prb: int) -> int:
    return 1 + int(math.ceil(math.log2(n_prb * (n_prb + 1) / 2))) + 31


def pack_sci0(d: Sci0, n_prb: int) -> np.ndarray:
    bits = np.zeros(sci0_size(n_prb), np.uint8)
    riv_w = sci0_size(n_prb) - 32

    def put(pos, v, w):
        for i in range(w):
            bits[pos + i] = (int(v) >> (w - 1 - i)) & 1
        return pos + w

    pos = put(0, d.hopping, 1)
    pos = put(pos, d.riv, riv_w)
    pos = put(pos, d.trp_idx, 7)
    pos = put(pos, d.mcs, 5)
    pos = put(pos, d.timing_advance, 11)
    put(pos, d.group_dst_id, 8)
    return bits


def unpack_sci0(bits: np.ndarray, n_prb: int) -> Sci0 | None:
    riv_w = sci0_size(n_prb) - 32

    def get(pos, w):
        v = 0
        for i in range(w):
            v = (v << 1) | int(bits[pos + i])
        return v, pos + w

    hop, pos = get(0, 1)
    riv, pos = get(pos, riv_w)
    trp, pos = get(pos, 7)
    mcs, pos = get(pos, 5)
    ta, pos = get(pos, 11)
    dst, pos = get(pos, 8)
    if riv >= n_prb * (n_prb + 1) // 2:
        return None
    return Sci0(riv, trp, mcs, ta, dst, hop)


@dataclass(frozen=True)
class Pscch:
    """PSCCH processor: 1 PRB, TM1/2 (pscch.c)."""

    cell_n_prb: int  # carrier bandwidth (SCI RIV modulus)
    prb_idx: int  # the PSCCH PRB
    cyclic_shift: int = 0  # DMRS shift from the pool config {0,3,6,9}

    @property
    def E(self) -> int:
        return 2 * SL_E_SYMS * NRE

    @functools.cached_property
    def _interleave(self) -> np.ndarray:
        return interleaver_indices(self.E, 2, SL_E_SYMS)

    @functools.cached_property
    def _geom(self) -> tuple[np.ndarray, np.ndarray]:
        nre = self.cell_n_prb * NRE
        return (_sym_grid_idx(self.prb_idx, 1, PSCCH_DATA_SYMS, nre),
                _sym_grid_idx(self.prb_idx, 1, SL_DMRS_SYMS, nre))

    def encode(self, sci: Sci0, grid):
        import jax.numpy as jnp

        payload = pack_sci0(sci, self.cell_n_prb)
        msg = np.concatenate([payload, crc_bits(payload, *LTE_CRC16)])
        k = len(msg)
        coded = rm_conv_tx(conv_encode(jnp.asarray(msg), k), self.E)
        coded = coded[..., jnp.asarray(self._interleave)]
        scr = coded ^ jnp.asarray(gold_sequence(PSCCH_SEED, self.E))
        sym = modulate(scr, Modulation.QPSK).reshape(SL_E_SYMS, NRE)
        freq = dft_precode(sym)[: len(PSCCH_DATA_SYMS)]
        data_idx, dmrs_idx = self._geom
        flat = grid.reshape(grid.shape[:-2] + (-1,))
        flat = flat.at[..., jnp.asarray(data_idx)].set(freq.reshape(-1))
        dm = pscch_dmrs(self.cyclic_shift)
        flat = flat.at[..., jnp.asarray(dmrs_idx)].set(
            jnp.asarray(dm.reshape(-1)))
        return flat.reshape(grid.shape)

    def decode(self, grid) -> Sci0 | None:
        import jax.numpy as jnp

        data_idx, dmrs_idx = self._geom
        flat = grid.reshape(grid.shape[:-2] + (-1,))
        dm = pscch_dmrs(self.cyclic_shift)
        ls = flat[..., jnp.asarray(dmrs_idx)] * jnp.conj(
            jnp.asarray(dm.reshape(-1)))
        h = jnp.mean(ls, axis=-1)
        y = flat[..., jnp.asarray(data_idx)]
        xt = equalize_zf(y, h[..., None])
        sym = dft_deprecode(xt.reshape(xt.shape[:-1]
                                       + (len(PSCCH_DATA_SYMS), NRE)))
        llr = demod_soft(sym.reshape(xt.shape[:-1] + (-1,)),
                         Modulation.QPSK)
        pad = jnp.zeros(llr.shape[:-1] + (self.E - llr.shape[-1],), llr.dtype)
        llr = jnp.concatenate([llr, pad], -1)
        llr = llr * jnp.asarray(gold_sequence_signed(PSCCH_SEED, self.E))
        llr = llr[..., jnp.asarray(np.argsort(self._interleave))]
        k = sci0_size(self.cell_n_prb) + SCI_CRC_LEN
        de_rm = rm_conv_rx(llr, 3 * k)
        bits = viterbi_decode(de_rm[None], k)[0]
        if not bool(np.asarray(crc_ok_device(bits, *LTE_CRC16))):
            return None
        return unpack_sci0(np.asarray(bits)[: k - SCI_CRC_LEN],
                           self.cell_n_prb)


@dataclass(frozen=True)
class Pssch:
    """PSSCH processor: turbo-coded data over the SCI-signaled PRBs
    (pssch.c: c_init = N_x_id*2^14 + (sf mod 10)*2^9 + 510)."""

    cell_n_prb: int
    prb_start: int
    n_prb: int
    n_x_id: int
    sf_idx: int
    mcs: int = 6  # UL-style MCS (QPSK/16QAM)

    @property
    def modulation(self) -> Modulation:
        return Modulation.QPSK if self.mcs <= 10 else Modulation.QAM16

    @property
    def tbs(self) -> int:
        from ..phch.ra_ul import ul_tbs

        return ul_tbs(self.mcs, self.n_prb)

    @functools.cached_property
    def cfg(self) -> DlschConfig:
        qm = self.modulation.bits_per_symbol
        g = qm * SL_E_SYMS * self.n_prb * NRE
        return DlschConfig(tbs=self.tbs, G=g, Qm=qm, rv=0)

    @property
    def cinit(self) -> int:
        return (self.n_x_id * 16384 + (self.sf_idx % 10) * 512 + 510) % (1 << 31)

    @functools.cached_property
    def _interleave(self) -> np.ndarray:
        return interleaver_indices(self.cfg.G, self.cfg.Qm, SL_E_SYMS)

    @functools.cached_property
    def _geom(self) -> tuple[np.ndarray, np.ndarray]:
        nre = self.cell_n_prb * NRE
        return (_sym_grid_idx(self.prb_start, self.n_prb, PSSCH_DATA_SYMS, nre),
                _sym_grid_idx(self.prb_start, self.n_prb, SL_DMRS_SYMS, nre))

    def encode(self, bits, grid):
        import jax.numpy as jnp

        coded = dlsch_encode(bits, self.cfg)
        coded = coded[..., jnp.asarray(self._interleave)].astype(jnp.uint8)
        scr = coded ^ jnp.asarray(gold_sequence(self.cinit, self.cfg.G))
        sym = modulate(scr, self.modulation)
        m_sc = self.n_prb * NRE
        sym = sym.reshape(sym.shape[:-1] + (SL_E_SYMS, m_sc))
        freq = dft_precode(sym)[..., : len(PSSCH_DATA_SYMS), :]
        data_idx, dmrs_idx = self._geom
        flat = grid.reshape(grid.shape[:-2] + (-1,))
        flat = flat.at[..., jnp.asarray(data_idx)].set(
            freq.reshape(freq.shape[:-2] + (-1,)))
        dm = pssch_dmrs(self.n_x_id, self.n_prb)
        flat = flat.at[..., jnp.asarray(dmrs_idx)].set(
            jnp.asarray(dm.reshape(-1)))
        return flat.reshape(grid.shape)

    def decode(self, grid, n_iter: int = 5):
        import jax.numpy as jnp

        data_idx, dmrs_idx = self._geom
        flat = grid.reshape(grid.shape[:-2] + (-1,))
        dm = pssch_dmrs(self.n_x_id, self.n_prb)
        ls = flat[..., jnp.asarray(dmrs_idx)] * jnp.conj(
            jnp.asarray(dm.reshape(-1)))
        h = jnp.mean(ls, axis=-1)
        y = flat[..., jnp.asarray(data_idx)]
        xt = equalize_zf(y, h[..., None])
        m_sc = self.n_prb * NRE
        sym = dft_deprecode(xt.reshape(xt.shape[:-1]
                                       + (len(PSSCH_DATA_SYMS), m_sc)))
        llr = demod_soft(sym.reshape(xt.shape[:-1] + (-1,)), self.modulation)
        pad = jnp.zeros(llr.shape[:-1] + (self.cfg.G - llr.shape[-1],),
                        llr.dtype)
        llr = jnp.concatenate([llr, pad], -1)
        llr = llr * jnp.asarray(gold_sequence_signed(self.cinit, self.cfg.G))
        llr = llr[..., jnp.asarray(np.argsort(self._interleave))]
        return dlsch_decode(llr, self.cfg, n_iter=n_iter)

"""NPDSCH: narrowband downlink shared channel (36.211 §10.2.3, npdsch.c).

Reference behavior: lib/src/phy/phch/npdsch.c + ra_nbiot.c — CRC24A,
K=7 tail-biting convolutional code (NB-IoT has no turbo), QPSK only, the
codeword spans `nof_sf` subframes with per-subframe scrambling
c_init = (rnti << 14) + ((nf % 2) << 13) + (sf_idx << 9) + n_id
(sequences.c srsran_sequence_npdsch:204); TBS from the 36.213 table
16.4.1.5.1-1 (tbs_tables_nbiot.h).  Standalone deployment: the PRB carries
only NRS, l_start = 0.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ...utils.jit import lazy_jit
from ..common.sequence import gold_sequence_signed
from ..fec.convolutional import (conv_encode, rm_conv_rx, rm_conv_tx,
                                 viterbi_decode)
from ..fec.crc import LTE_CRC24A, crc_bits, crc_ok_device
from ..mimo import alamouti_decode_2tx, alamouti_encode_2tx, equalize_zf
from ..modem.modem import Modulation, demod_soft, modulate
from .nrs import nrs_reserved_sc

# 36.213 table 16.4.1.3-1: I_SF -> number of subframes
NOF_SF_TABLE = (1, 2, 3, 4, 5, 6, 8, 10)

# 36.213 table 16.4.1.5.1-1 (R13 cap at 680; tbs_tables_nbiot.h)
TBS_TABLE_NB = (
    (16, 32, 56, 88, 120, 152, 208, 256),
    (24, 56, 88, 144, 176, 208, 256, 344),
    (32, 72, 144, 176, 208, 256, 328, 424),
    (40, 104, 176, 208, 256, 328, 440, 568),
    (56, 120, 208, 256, 328, 408, 552, 680),
    (72, 144, 224, 328, 424, 504, 680, 0),
    (88, 176, 256, 392, 504, 600, 0, 0),
    (104, 224, 328, 472, 584, 680, 0, 0),
    (120, 256, 392, 536, 680, 0, 0, 0),
    (136, 296, 456, 616, 0, 0, 0, 0),
    (144, 328, 504, 680, 0, 0, 0, 0),
    (176, 376, 584, 0, 0, 0, 0, 0),
    (208, 440, 680, 0, 0, 0, 0, 0),
)


@dataclass(frozen=True)
class NbDlGrant:
    """NPDSCH allocation (single PRB, whole-band by definition)."""

    i_tbs: int
    i_sf: int
    l_start: int = 0  # 0 standalone / guard band; 3 in-band

    @property
    def nof_sf(self) -> int:
        return NOF_SF_TABLE[self.i_sf]

    @property
    def tbs(self) -> int:
        tbs = TBS_TABLE_NB[self.i_tbs][self.i_sf]
        if tbs == 0:
            raise ValueError(f"invalid (I_TBS={self.i_tbs}, I_SF={self.i_sf})")
        return tbs


@functools.lru_cache(maxsize=None)
def npdsch_re_indices(n_id: int, nof_ports: int, l_start: int = 0) -> np.ndarray:
    """Flat 1-PRB subframe-grid data RE indices (NRS punctured)."""
    res = nrs_reserved_sc(n_id, nof_ports)
    idx = []
    for l in range(l_start, 14):
        ks = np.arange(12)
        if l in res:
            ks = ks[[k not in res[l] for k in ks]]
        idx.append(l * 12 + ks)
    return np.concatenate(idx).astype(np.int32)


@dataclass(frozen=True)
class Npdsch:
    """NPDSCH processor for one (n_id, grant, rnti) bucket."""

    n_id: int
    grant: NbDlGrant
    rnti: int
    nof_ports: int = 1

    @functools.cached_property
    def re_idx(self) -> np.ndarray:
        return npdsch_re_indices(self.n_id, self.nof_ports,
                                 self.grant.l_start)

    @property
    def nof_re(self) -> int:
        return len(self.re_idx)

    @property
    def G(self) -> int:
        return 2 * self.nof_re * self.grant.nof_sf

    def _scramble_signed(self, sf_idx: int, nf: int) -> np.ndarray:
        cinit = ((self.rnti << 14) + ((nf % 2) << 13) + (sf_idx << 9)
                 + self.n_id) % (1 << 31)
        return gold_sequence_signed(cinit, 2 * self.nof_re)

    def encode(self, bits, grids_sf, sf_nf: tuple):
        """bits [tbs] -> list of per-subframe grids.

        grids_sf: [nof_sf, nports, 14, 12]; sf_nf: tuple of (sf_idx, nf)
        per subframe (scrambling re-initializes every subframe).
        """
        import jax.numpy as jnp

        crc = crc_bits(np.asarray(bits, np.uint8), *LTE_CRC24A)
        msg = jnp.concatenate([jnp.asarray(bits, jnp.uint8),
                               jnp.asarray(crc)])
        k = self.grant.tbs + 24
        coded = rm_conv_tx(conv_encode(msg, k), self.G)
        idx = jnp.asarray(self.re_idx)
        out = []
        for i, (sf_idx, nf) in enumerate(sf_nf):
            chunk = coded[..., 2 * self.nof_re * i : 2 * self.nof_re * (i + 1)]
            s = jnp.asarray(self._scramble_signed(sf_idx, nf) < 0, jnp.uint8)
            sym = modulate(chunk ^ s, Modulation.QPSK)
            g = grids_sf[i]
            flat = g.reshape(g.shape[:-2] + (-1,))
            if self.nof_ports == 1:
                flat = flat.at[..., 0, idx].set(sym)
            else:
                tx = alamouti_encode_2tx(sym)
                flat = flat.at[..., 0, idx].set(tx[..., 0, :])
                flat = flat.at[..., 1, idx].set(tx[..., 1, :])
            out.append(flat.reshape(g.shape))
        return out

    def decode(self, grids_rx, ces, sf_nf: tuple):
        """grids_rx [nof_sf, 14, 12], ces [nof_sf, nports, 14, 12]
        -> (bits [tbs], crc_ok)."""
        import jax.numpy as jnp

        idx = jnp.asarray(self.re_idx)
        llrs = []
        for i, (sf_idx, nf) in enumerate(sf_nf):
            y = grids_rx[i].reshape(-1)[idx]
            if self.nof_ports == 1:
                h = ces[i][0].reshape(-1)[idx]
                xhat = equalize_zf(y, h)
            else:
                xhat = alamouti_decode_2tx(y, ces[i][0].reshape(-1)[idx],
                                           ces[i][1].reshape(-1)[idx])
            llr = demod_soft(xhat, Modulation.QPSK)
            llrs.append(llr * jnp.asarray(self._scramble_signed(sf_idx, nf)))
        full = jnp.concatenate(llrs, axis=-1)
        k = self.grant.tbs + 24
        de_rm = rm_conv_rx(full, 3 * k)
        bits = viterbi_decode(de_rm[None], k)[0]
        ok = crc_ok_device(bits, *LTE_CRC24A)
        return bits[..., : self.grant.tbs], ok

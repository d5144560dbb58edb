"""NR PDSCH processor, single layer / type-1 DMRS (38.211 §7.3.1, pdsch_nr.c).

Reference behavior: lib/src/phy/phch/pdsch_nr.c — NR DL-SCH (LDPC) coding,
scrambling c_init = rnti*2^15 + n_ID, modulation up to 256QAM, mapping over
the 14-symbol slot grid skipping the DMRS symbol(s); decode with DMRS LS
channel estimation + equalization.

Single antenna port, full-slot allocation per (carrier, n_prb, mcs) bucket;
the same static-gather idioms as the LTE pdsch.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ...utils.jit import lazy_jit
from ..common.scrambling import scramble_bits, scramble_llr
from ..mimo import equalize_zf
from ..modem.modem import Modulation, demod_soft, modulate
from .dlsch_nr import NrDlschConfig, nr_dlsch_decode, nr_dlsch_encode
from .dmrs import dmrs_subcarriers, dmrs_symbols, dmrs_values
from .params import NSYMB_SLOT, NrCarrier
from .ra_nr import NrGrant

DMRS_SYMBOL = 2  # PDSCH mapping type A, single-symbol DMRS at l=2


def pdsch_nr_cinit(rnti: int, n_id: int, q: int = 0) -> int:
    return ((rnti << 15) + (q << 14) + n_id) % (1 << 31)


@dataclass(frozen=True)
class NrPdsch:
    """Two operating modes: full-slot (legacy mcs_qm/rate fields) or
    grant-based (`grant` set: PRB range + symbol span + 38.214 MCS/TBS,
    as signaled by DCI 1_0 — ra_nr.c srsran_ra_nr_fill_tb)."""

    carrier: NrCarrier
    mcs_qm: int = 6  # modulation order (2/4/6/8), legacy full-slot mode
    rate: float = 0.5  # target code rate -> TBS = rate * available bits
    rnti: int = 0x4601
    slot: int = 0
    grant: "NrGrant | None" = None
    dmrs_type: int = 1  # 38.211 configuration type 1 (comb) or 2 (pairs)
    dmrs_add_pos: int = 0  # dmrs-AdditionalPosition (table 7.4.1.1.2-3)

    @property
    def modulation(self) -> Modulation:
        if self.grant is not None:
            return self.grant.modulation
        return {2: Modulation.QPSK, 4: Modulation.QAM16, 6: Modulation.QAM64,
                8: Modulation.QAM256}[self.mcs_qm]

    @property
    def _qm(self) -> int:
        return self.grant.qm if self.grant is not None else self.mcs_qm

    @property
    def _sc_range(self) -> tuple[int, int]:
        if self.grant is None:
            return 0, self.carrier.nof_re
        g = self.grant
        return g.prb_start * 12, (g.prb_start + g.n_prb) * 12

    @property
    def _dmrs_syms(self) -> tuple[int, ...]:
        return dmrs_symbols(self.dmrs_add_pos)

    @property
    def _symbols(self) -> list[int]:
        dm = set(self._dmrs_syms)
        if self.grant is None:
            return [l for l in range(NSYMB_SLOT) if l not in dm]
        g = self.grant
        return [l for l in range(g.start_sym, g.start_sym + g.n_sym)
                if l not in dm]

    @functools.cached_property
    def re_idx(self) -> np.ndarray:
        """Data RE indices over the slot grid [NSYMB_SLOT, nof_re]."""
        nre = self.carrier.nof_re
        k0, k1 = self._sc_range
        idx = [l * nre + np.arange(k0, k1) for l in self._symbols]
        return np.concatenate(idx).astype(np.int32)

    @functools.cached_property
    def cfg(self) -> NrDlschConfig:
        from .dlsch_nr import nr_cbsegm

        g = len(self.re_idx) * self._qm
        if self.grant is not None:
            return NrDlschConfig(tbs=self.grant.tbs, G=g, Qm=self._qm,
                                 rate=self.grant.rate, rv=self.grant.rv)
        tbs = int(g * self.rate) // 8 * 8  # simplified 38.214 TBS quantize
        # 38.214 TBS values make B divisible by C; our simplified quantizer
        # walks down until the segmentation divides evenly
        while tbs > 8:
            seg = nr_cbsegm(tbs, self.rate)
            if (tbs + seg.tb_crc_len) % seg.C == 0:
                break
            tbs -= 8
        return NrDlschConfig(tbs=tbs, G=g, Qm=self.mcs_qm, rate=self.rate)

    @property
    def tbs(self) -> int:
        return self.cfg.tbs

    @property
    def cinit(self) -> int:
        return pdsch_nr_cinit(self.rnti, self.carrier.n_id)

    # -- gNB side -------------------------------------------------------------
    @lazy_jit(static_argnums=(0,))
    def encode(self, bits):
        """bits [..., tbs] -> slot grid [..., NSYMB_SLOT, nof_re] complex64."""
        import jax.numpy as jnp

        nre = self.carrier.nof_re
        coded = nr_dlsch_encode(bits, self.cfg)
        scr = scramble_bits(coded, self.cinit)
        sym = modulate(scr, self.modulation)
        grid = jnp.zeros(bits.shape[:-1] + (NSYMB_SLOT * nre,), jnp.complex64)
        grid = grid.at[..., jnp.asarray(self.re_idx)].set(sym)
        grid = grid.reshape(bits.shape[:-1] + (NSYMB_SLOT, nre))
        for l in self._dmrs_syms:
            ks, pil = self._dmrs(l)
            grid = grid.at[..., l, jnp.asarray(ks)].set(jnp.asarray(pil))
        return grid

    def _dmrs(self, l: int) -> tuple[np.ndarray, np.ndarray]:
        """DMRS positions + values of symbol l within the allocation."""
        ks = dmrs_subcarriers(self.carrier, self.dmrs_type)
        pil = dmrs_values(self.carrier, self.slot, l, self.dmrs_type)
        k0, k1 = self._sc_range
        sel = (ks >= k0) & (ks < k1)
        return ks[sel], pil[sel]

    @functools.cached_property
    def _interp_plan(self):
        """(left, right, t) linear-interp plan from the allocation's pilot
        subcarriers onto every allocated subcarrier (works for the type-1
        comb and type-2 pair layouts alike)."""
        ks, _ = self._dmrs(self._dmrs_syms[0])
        k0, k1 = self._sc_range
        sc = ks - k0
        tgt = np.arange(k1 - k0)
        right = np.searchsorted(sc, tgt).clip(1, len(sc) - 1)
        left = right - 1
        denom = np.maximum(sc[right] - sc[left], 1)
        t = ((tgt - sc[left]) / denom).clip(0.0, 1.0).astype(np.float32)
        return left.astype(np.int32), right.astype(np.int32), t

    # -- UE side --------------------------------------------------------------
    @lazy_jit(static_argnums=(0,), static_argnames=("n_iter",))
    def decode(self, grid, n_iter: int = 10):
        """grid [..., NSYMB_SLOT, nof_re] -> (bits, ok, info).

        LS estimate at the DMRS comb, linear interpolation across the comb,
        constant extrapolation in time (single-symbol DMRS), ZF equalize.
        """
        import jax.numpy as jnp

        # LS per DMRS symbol, time-averaged (additional positions improve
        # the estimate; a single symbol reduces to the old behavior)
        ls = 0.0
        for l in self._dmrs_syms:
            ks_np, pil_np = self._dmrs(l)
            ls = ls + grid[..., l, jnp.asarray(ks_np)] * jnp.conj(
                jnp.asarray(pil_np))  # |pil| = 1
        ls = ls / len(self._dmrs_syms)
        # pilot set -> allocation band by linear interpolation (a repeated
        # stair-step estimate biases the odd subcarriers enough to break
        # 256QAM on selective channels); the plan handles the type-1 comb
        # and the type-2 pair layout alike
        left, right, t = self._interp_plan
        ce = (ls[..., jnp.asarray(left)] * (1 - jnp.asarray(t))
              + ls[..., jnp.asarray(right)] * jnp.asarray(t))
        noise = jnp.mean(jnp.abs(ls[..., 2:] + ls[..., :-2]
                                 - 2 * ls[..., 1:-1]) ** 2, -1) / 6

        flat = grid.reshape(grid.shape[:-2] + (-1,))
        y = flat[..., jnp.asarray(self.re_idx)]
        h = jnp.tile(ce, (len(self._symbols),))  # same CE every data symbol
        xhat = equalize_zf(y, h)
        gain = jnp.abs(h) ** 2
        w = gain / jnp.maximum(noise[..., None], 1e-9)
        llr = demod_soft(xhat, self.modulation)
        llr = llr * jnp.repeat(w, self._qm, axis=-1)
        # saturate like the reference's int8/int16 LLR paths: keeps the
        # filler-bit known-zero priors (-1e4 in rm_rx) dominant at high SNR
        llr = jnp.clip(llr, -1e3, 1e3)
        llr = scramble_llr(llr, self.cinit)
        bits, ok = nr_dlsch_decode(llr, self.cfg, n_iter=n_iter)
        return bits, ok, {"noise": noise}

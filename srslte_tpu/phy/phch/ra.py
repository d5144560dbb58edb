"""DL resource allocation & MCS/TBS math (36.213 §7.1.7, ra_dl.c equivalent).

Reference behavior: lib/src/phy/phch/{ra.c, ra_dl.c}; TBS data in
_tbs_data.py (standard ETSI table, same data as tbs_tables.h).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..modem.modem import Modulation
from ._tbs_data import TBS_TABLE

# 36.213 table 7.1.7.1-1: MCS -> I_TBS (tbs_tables.h dl_mcs_tbs_idx_table)
DL_MCS_TO_ITBS = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 10, 11, 12, 13,
                  14, 15, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26]


def dl_mcs_modulation(mcs: int) -> Modulation:
    if mcs <= 9:
        return Modulation.QPSK
    if mcs <= 16:
        return Modulation.QAM16
    if mcs <= 28:
        return Modulation.QAM64
    raise ValueError(f"reserved/unsupported DL MCS {mcs}")


def dl_tbs(mcs: int, n_prb: int) -> int:
    """Transport block size in bits for MCS + allocated PRB count."""
    if not 1 <= n_prb <= 110:
        raise ValueError(f"invalid n_prb {n_prb}")
    return TBS_TABLE[DL_MCS_TO_ITBS[mcs]][n_prb - 1]


def tbs_from_itbs(i_tbs: int, n_prb: int) -> int:
    return TBS_TABLE[i_tbs][n_prb - 1]


@dataclass(frozen=True)
class DlGrant:
    """A downlink allocation: PRB mask + MCS (single transport block, TM1/TM2)."""

    prb_mask: tuple[bool, ...]  # length cell.n_prb, same for both slots
    mcs: int
    rv: int = 0
    # For P/SI/RA-RNTI format-1A grants the TBS is looked up with
    # N_prb_1A in {2,3} (from the TPC LSB) and modulation is QPSK,
    # independent of the allocated PRB count (ra_dl.c:374-381).
    tbs_override: int | None = None
    mod_override: Modulation | None = None

    @property
    def n_prb(self) -> int:
        return int(sum(self.prb_mask))

    @property
    def modulation(self) -> Modulation:
        if self.mod_override is not None:
            return self.mod_override
        return dl_mcs_modulation(self.mcs)

    @property
    def tbs(self) -> int:
        if self.tbs_override is not None:
            return self.tbs_override
        return dl_tbs(self.mcs, self.n_prb)

    @staticmethod
    def full(cell_n_prb: int, mcs: int, rv: int = 0) -> "DlGrant":
        return DlGrant(tuple([True] * cell_n_prb), mcs, rv)

    @staticmethod
    def type0(cell_n_prb: int, rbg_bitmask: int, mcs: int, rv: int = 0) -> "DlGrant":
        """RA type 0: bitmap over RBGs (36.213 §7.1.6.1), MSB = RBG 0."""
        p = rbg_size(cell_n_prb)
        n_rbg = -(-cell_n_prb // p)
        mask = np.zeros(cell_n_prb, bool)
        for g in range(n_rbg):
            if (rbg_bitmask >> (n_rbg - 1 - g)) & 1:
                mask[g * p : min((g + 1) * p, cell_n_prb)] = True
        return DlGrant(tuple(mask.tolist()), mcs, rv)

    @staticmethod
    def type2(cell_n_prb: int, rb_start: int, l_crb: int, mcs: int, rv: int = 0) -> "DlGrant":
        """RA type 2 (contiguous, DCI 1A; 36.213 §7.1.6.3)."""
        mask = np.zeros(cell_n_prb, bool)
        mask[rb_start : rb_start + l_crb] = True
        return DlGrant(tuple(mask.tolist()), mcs, rv)


def rbg_size(cell_n_prb: int) -> int:
    """RBG size P per bandwidth (36.213 table 7.1.6.1-1)."""
    if cell_n_prb <= 10:
        return 1
    if cell_n_prb <= 26:
        return 2
    if cell_n_prb <= 63:
        return 3
    return 4


def riv_type2(cell_n_prb: int, rb_start: int, l_crb: int) -> int:
    """Resource indication value for DCI 1A (36.213 §7.1.6.3, ra.c)."""
    if l_crb < 1 or rb_start + l_crb > cell_n_prb:
        raise ValueError("invalid type2 allocation")
    if (l_crb - 1) <= cell_n_prb // 2:
        return cell_n_prb * (l_crb - 1) + rb_start
    return cell_n_prb * (cell_n_prb - l_crb + 1) + (cell_n_prb - 1 - rb_start)


def riv_type2_decode(cell_n_prb: int, riv: int) -> tuple[int, int]:
    l_crb = riv // cell_n_prb + 1
    rb_start = riv % cell_n_prb
    if rb_start + l_crb > cell_n_prb:
        l_crb = cell_n_prb - l_crb + 2
        rb_start = cell_n_prb - 1 - rb_start
    return rb_start, l_crb

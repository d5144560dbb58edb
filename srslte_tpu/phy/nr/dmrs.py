"""NR PDSCH DMRS, configuration type 1 (38.211 §7.4.1.1, dmrs_sch.c).

Reference behavior: lib/src/phy/ch_estimation/dmrs_sch.c — Gold sequence
c_init = (2^17 (14 n_slot + l + 1)(2 N_ID + 1) + 2 N_ID) mod 2^31, QPSK
pilots on the even subcarriers (comb-2, delta=0, port 1000).
"""

from __future__ import annotations

import functools

import numpy as np

from ..common.sequence import gold_sequence
from .params import NrCarrier


def dmrs_cinit(slot: int, l: int, n_id: int) -> int:
    return ((1 << 17) * (14 * slot + l + 1) * (2 * n_id + 1) + 2 * n_id) % (1 << 31)


@functools.lru_cache(maxsize=None)
def dmrs_values(carrier: NrCarrier, slot: int, l: int) -> np.ndarray:
    """Pilot values on the comb: [6 * n_prb] complex64 (type 1, delta 0)."""
    c = gold_sequence(dmrs_cinit(slot, l, carrier.n_id),
                      2 * 6 * carrier.n_prb).astype(np.float32)
    vals = (1 - 2 * c[0::2]) + 1j * (1 - 2 * c[1::2])
    return (vals / np.sqrt(2)).astype(np.complex64)


def dmrs_subcarriers(carrier: NrCarrier) -> np.ndarray:
    """Comb-2 positions (delta = 0): even subcarriers."""
    return (2 * np.arange(6 * carrier.n_prb)).astype(np.int32)

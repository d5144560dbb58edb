"""EARFCN <-> carrier frequency helpers (36.101 §5.7.3, phy_common.c).

Reference behavior: lib/src/phy/common/phy_common.c lte_bands table +
srsran_band_fd:674 / get_fu:639 / srsran_band_get_band:661 /
srsran_band_is_tdd:648.  Band data ships as lte_bands.npy
(tools/extract_lte_bands.py) — columns: band, F_DL_low MHz, N_Offs_DL,
N_Offs_UL, duplex spacing MHz.
"""

from __future__ import annotations

import functools
import os

import numpy as np

_PATH = os.path.join(os.path.dirname(__file__), "lte_bands.npy")


@functools.lru_cache(maxsize=1)
def _bands() -> np.ndarray:
    return np.load(_PATH)


def band_from_dl_earfcn(dl_earfcn: int) -> int:
    """Band number owning a DL EARFCN (srsran_band_get_band)."""
    t = _bands()
    i = len(t) - 1
    if dl_earfcn > t[i][2]:
        raise ValueError(f"invalid DL EARFCN {dl_earfcn}")
    i -= 1
    while i > 0 and t[i][2] > dl_earfcn:
        i -= 1
    return int(t[i][0])


def _row(band: int) -> np.ndarray:
    t = _bands()
    hit = t[t[:, 0] == band]
    if not len(hit):
        raise ValueError(f"unknown LTE band {band}")
    return hit[0]


def dl_freq_hz(dl_earfcn: int) -> float:
    """F_DL = F_DL_low + 0.1 MHz * (N_DL - N_Offs_DL)."""
    r = _row(band_from_dl_earfcn(dl_earfcn))
    return (r[1] + 0.1 * (dl_earfcn - r[2])) * 1e6


def ul_freq_hz(ul_earfcn: int) -> float:
    """F_UL from the UL EARFCN (duplex-spaced below F_DL_low)."""
    t = _bands()
    fdd = t[t[:, 3] > 0]
    i = len(fdd) - 1
    while i > 0 and fdd[i][3] > ul_earfcn:
        i -= 1
    r = fdd[i]
    return (r[1] - r[4] + 0.1 * (ul_earfcn - r[3])) * 1e6


def ul_earfcn_from_dl(dl_earfcn: int) -> int:
    """Default UL EARFCN paired with a DL EARFCN (N_UL = N_DL + offset)."""
    r = _row(band_from_dl_earfcn(dl_earfcn))
    if r[3] == 0:
        return dl_earfcn  # TDD: same carrier
    return int(dl_earfcn - r[2] + r[3])


def band_is_tdd(band: int) -> bool:
    return _row(band)[3] == 0

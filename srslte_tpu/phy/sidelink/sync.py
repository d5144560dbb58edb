"""Sidelink synchronization signals PSSS/SSSS (36.211 §9.7, psss.c/ssss.c).

PSSS: length-62 ZC-style sequences with roots 26/37 (N_id_2 in {0, 1},
negative sign — psss.c:150) in symbols 1-2 of the sync subframe; SSSS: the
LTE SSS m-sequence construction with id1 = N_sl_id mod 168,
id2 = N_sl_id div 168, subframe-0 variant for TM1/2 (ssss.c:168).
"""

from __future__ import annotations

import functools

import numpy as np

from ..sync.sss import sss_sequence

PSSS_LEN = 62
PSSS_ROOTS = (26, 37)


@functools.lru_cache(maxsize=None)
def psss_sequence(n_id_2: int) -> np.ndarray:
    """[62] complex64 (psss.c srsran_psss_generate:145)."""
    root = PSSS_ROOTS[n_id_2]
    i = np.arange(PSSS_LEN, dtype=np.float64)
    arg = np.where(i < 31, -np.pi * root * i * (i + 1) / 63,
                   -np.pi * root * (i + 2) * (i + 1) / 63)
    return np.exp(1j * arg).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def ssss_sequence(n_sl_id: int) -> np.ndarray:
    """[62] SSSS (subframe-0 sequence, TM1/2)."""
    return sss_sequence(n_sl_id % 168, n_sl_id // 168, sf5=False)


def psss_detect(d62) -> tuple[int, float]:
    """Frequency-domain detect over the center 62 SCs -> (N_id_2, corr)."""
    import jax.numpy as jnp

    cands = jnp.stack([jnp.asarray(psss_sequence(i)) for i in range(2)])
    c = jnp.abs(jnp.einsum("cn,...n->...c", jnp.conj(cands), d62))
    c = c / jnp.maximum(jnp.linalg.norm(d62, axis=-1)[..., None]
                        * np.sqrt(PSSS_LEN), 1e-12)
    best = jnp.argmax(c, axis=-1)
    return int(np.asarray(best)), float(np.asarray(jnp.max(c, axis=-1)))


def ssss_detect(d62, coherent_ref=None) -> tuple[int, float]:
    """Full-bank SSSS detect: correlate all 336 ids -> (N_sl_id, corr).

    `coherent_ref` (e.g. the PSSS-derived channel estimate over the 62 SCs)
    equalizes before correlation when given."""
    import jax.numpy as jnp

    bank = jnp.asarray(np.stack([ssss_sequence(i) for i in range(336)])
                       .astype(np.complex64))
    y = d62
    if coherent_ref is not None:
        y = d62 * jnp.conj(coherent_ref) / jnp.maximum(
            jnp.abs(coherent_ref) ** 2, 1e-12)
    c = jnp.abs(jnp.einsum("cn,...n->...c", jnp.conj(bank), y))
    c = c / jnp.maximum(jnp.linalg.norm(y, axis=-1)[..., None]
                        * np.sqrt(PSSS_LEN), 1e-12)
    best = jnp.argmax(c, axis=-1)
    return int(np.asarray(best)), float(np.asarray(jnp.max(c, axis=-1)))

"""SC-FDMA transform precoding (36.211 §5.3.3, dft_precoding.c equivalent).

Reference behavior: lib/src/phy/dft/dft_precoding.c — forward DFT of size
M = n_prb*12 per SC-FDMA data symbol with 1/sqrt(M) normalization, and the
valid-PRB rule (prime factors 2, 3, 5 only, srsran_dft_precoding_valid_prb).

TPU-first: one batched FFT over [..., nsymb, M]; XLA's FFT handles the mixed
radix sizes directly (no per-size plan objects).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def valid_prb(n_prb: int) -> bool:
    """True if n_prb factors into 2^a * 3^b * 5^c (dft_precoding.c:39)."""
    n = n_prb
    for p in (2, 3, 5):
        while n % p == 0:
            n //= p
    return n == 1


def dft_precode(x):
    """x [..., M] modulation symbols -> frequency-domain [..., M]."""
    m = x.shape[-1]
    return jnp.fft.fft(x, axis=-1) * (1.0 / np.sqrt(m))


def dft_deprecode(y):
    """Inverse transform precoding: [..., M] -> [..., M]."""
    m = y.shape[-1]
    return jnp.fft.ifft(y, axis=-1) * np.sqrt(m)

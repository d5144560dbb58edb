"""AWGN channel (ch_awgn.c equivalent).

Reference behavior: lib/src/phy/channel/ch_awgn.c — complex Gaussian noise at
a configured SNR/N0.  TPU-first: jax PRNG keys, pure function, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def awgn_power(key, x, n0: float):
    """Add complex Gaussian noise with total noise power n0 per sample."""
    kr, ki = jax.random.split(key)
    std = jnp.sqrt(n0 / 2)
    n = (jax.random.normal(kr, x.shape) + 1j * jax.random.normal(ki, x.shape))
    return x + std.astype(jnp.float32) * n.astype(jnp.complex64)


def awgn(key, x, snr_db: float):
    """Add noise at an SNR relative to the measured mean power of x."""
    p = jnp.mean(jnp.abs(x) ** 2)
    n0 = p / (10.0 ** (snr_db / 10.0))
    return awgn_power(key, x, n0)

"""Fractional delay via frequency-domain phase ramp (delay.c equivalent).

Reference behavior: lib/src/phy/channel/delay.c — periodically drifting
sample delay applied in the frequency domain.
"""

from __future__ import annotations

import jax.numpy as jnp


def fractional_delay(x, delay_samples):
    """Delay x [..., n] by a (possibly fractional, traced) sample count."""
    n = x.shape[-1]
    f = jnp.fft.fftfreq(n)
    ramp = jnp.exp(-2j * jnp.pi * f * delay_samples)
    return jnp.fft.ifft(jnp.fft.fft(x, axis=-1) * ramp, axis=-1).astype(x.dtype)


def delay_drift(t_s, period_s: float, max_delay_us: float, srate: int):
    """Triangular delay trajectory (delay.c semantics): samples at time t."""
    import numpy as np

    phase = (t_s % period_s) / period_s
    tri = 2 * np.minimum(phase, 1 - phase)
    return tri * max_delay_us * 1e-6 * srate

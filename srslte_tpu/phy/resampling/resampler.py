"""Sample-rate conversion (resampler.c / resample_arb.c / interp.c).

Reference behavior: lib/src/phy/resampling/resampler.c — FFT-domain integer
interpolation/decimation (used by radio.cc when device rate != cell rate);
interp.c linear interpolation helpers (used by chest).

TPU-first: rational L/M resampling as one zero-stuffed FFT -> spectral
crop/pad -> IFFT over the whole buffer (batched over leading dims), instead
of the reference's streaming polyphase loops.  Exact for bandlimited signals
and cyclic buffers; block edges see the usual FFT wraparound (callers keep
a halo, as the radio does with its resampler state).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def resample_fft(x, up: int, down: int):
    """Resample x [..., n] by rational factor up/down via spectral resize.

    n*up must be divisible by down.  Energy-preserving amplitude scaling.
    """
    n = x.shape[-1]
    m = n * up // down
    if m * down != n * up:
        raise ValueError(f"{n}*{up}/{down} is not an integer output length")
    xf = jnp.fft.fft(x, axis=-1)
    out = jnp.zeros(x.shape[:-1] + (m,), xf.dtype)
    k = min(n, m)
    half = k // 2
    out = out.at[..., :half].set(xf[..., :half])
    out = out.at[..., m - half :].set(xf[..., n - half :])
    return (jnp.fft.ifft(out, axis=-1) * (m / n)).astype(jnp.complex64)


def interp_linear_cf(x, ratio: int):
    """Linear interpolation by an integer factor (interp.c linear mode)."""
    n = x.shape[-1]
    xi = jnp.arange(n * ratio) / ratio
    i0 = jnp.floor(xi).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n - 1)
    frac = (xi - i0).astype(jnp.float32)
    return x[..., i0] * (1 - frac) + x[..., i1] * frac

"""Carrier-frequency-offset estimation and correction.

Reference behavior: lib/src/phy/sync/cfo.c (srsran_cfo_correct: complex
exponential multiply, :96) and cp.c (CP-based estimator: correlate each CP
with the symbol tail one FFT-length later).

TPU-first: correction is one fused elementwise complex multiply with an iota
phase ramp (the reference precomputes a cexp table; XLA fuses the exp into
the multiply).  The CP estimator is a gather + reduction over all symbols of
a subframe at once.
"""

from __future__ import annotations

import numpy as np

from ..common.params import OfdmParams


def cfo_correct(x, cfo, fft_size: int, n0=0):
    """x[..., L] * exp(-j*2*pi*cfo*(n0 + n)/fft_size).

    cfo is in subcarrier-spacing units (as everywhere in the reference);
    n0 is the absolute sample index of x[..., 0] (keeps phase continuous
    across block boundaries in streaming use). cfo/n0 may be traced.
    """
    import jax.numpy as jnp

    n = jnp.arange(x.shape[-1])
    cfo = jnp.asarray(cfo)
    phase = -2j * jnp.pi * cfo[..., None].astype(jnp.complex64) * (n + n0) / fft_size
    return x * jnp.exp(phase)


def cfo_estimate_cp(samples, params: OfdmParams):
    """CP-based CFO estimate from one subframe [..., sf_len] -> cfo [...].

    For every symbol, corr = sum_cp conj(x[n]) * x[n + N]; the CP repeats the
    symbol tail, so arg(corr) = 2*pi*cfo.  Averaged over all symbols of the
    subframe (cp.c behavior at subframe granularity).
    """
    import jax.numpy as jnp

    n = params.symbol_sz
    offs, cps = [], []
    pos = 0
    for cp in np.array(params.cp_lens_slot() * 2, np.int64):
        offs.append(pos)
        cps.append(cp)
        pos += cp + n
    cp_min = min(cps)
    # use the last cp_min samples of each CP (aligned with the symbol tail)
    idx = np.stack([o + c - cp_min + np.arange(cp_min) for o, c in zip(offs, cps)])
    a = samples[..., idx]  # [..., nsym, cp_min]
    b = samples[..., idx + n]
    corr = jnp.sum(jnp.conj(a) * b, axis=(-1, -2))
    return jnp.angle(corr) / (2 * jnp.pi)

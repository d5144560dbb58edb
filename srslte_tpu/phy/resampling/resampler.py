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

import functools
import os

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


# ---------------------------------------------------------------------------
# Arbitrary-ratio polyphase resampler (resample_arb.c)
# ---------------------------------------------------------------------------

ARB_N, ARB_M = 32, 8  # phases, taps (SRSRAN_RESAMPLE_ARB_N/_M)


@functools.lru_cache(maxsize=1)
def _arb_polyfilt() -> np.ndarray:
    """The reference's 32-phase x 8-tap bank (tools/extract_arb_polyfilt.py
    from resample_arb.c srsran_resample_arb_polyfilt)."""
    path = os.path.join(os.path.dirname(__file__), "arb_polyfilt.npz")
    return np.load(path)["polyfilt"].astype(np.float32)


@functools.lru_cache(maxsize=64)
def _arb_plan(n_in: int, rate: float, interpolate: bool):
    """Precompute (window gather idx [n_out, M], phase idx [n_out], frac).

    Mirrors the reference's streaming accumulator (resample_arb.c
    srsran_resample_arb_compute): output j is taken at accumulated phase
    j*step with step = N/rate; cnt_j input samples have been consumed when
    it is emitted, and its filter window is input[cnt_j - M : cnt_j] (zeros
    before the first sample).  Outputs run while cnt_j < n_in.
    """
    # The accumulator is stepped SEQUENTIALLY (float64) exactly like the
    # reference's loop rather than as the closed form j*step mod N: at
    # rational rates the phase lands on exact filter-bank boundaries and
    # the closed form rounds the other way, swapping whole phase rows.
    step = ARB_N / rate
    acc = 0.0
    cnt_i = 0
    cnts, idxs, fracs = [], [], []
    while cnt_i < n_in:
        i = int(acc)
        cnts.append(cnt_i)
        idxs.append(i)
        fracs.append(abs(acc - i))
        acc += step
        i = int(acc)
        while i >= ARB_N:
            acc -= ARB_N
            i -= ARB_N
            cnt_i += 1
    cnt = np.asarray(cnts, np.int64)
    idx = np.asarray(idxs, np.int32)
    frac = np.asarray(fracs, np.float32)
    n_out = len(cnts)
    win = cnt[:, None] - ARB_M + np.arange(ARB_M)[None, :]  # [n_out, M]
    pad = win < 0
    return (np.where(pad, 0, win).astype(np.int32), pad, idx,
            frac if interpolate else None)


def resample_arb(x, rate: float, interpolate: bool = False):
    """Arbitrary-ratio polyphase resampler (resample_arb.c equivalent).

    x [..., n_in] complex -> [..., n_out] at `rate` (out/in).  TPU-first:
    the reference's per-sample accumulator loop becomes a precomputed
    [n_out, M]-window gather + per-output filter-row gather, contracted in
    one einsum; `interpolate` blends adjacent phase rows by the fractional
    phase exactly as the streaming loop does.
    """
    n_in = x.shape[-1]
    win, pad, idx, frac = _arb_plan(n_in, float(rate), interpolate)
    bank = jnp.asarray(_arb_polyfilt())
    taps = bank[jnp.asarray(idx)]  # [n_out, M]
    if frac is not None:
        nxt = bank[jnp.asarray((idx + 1) % ARB_N)]
        taps = taps + (nxt - taps) * jnp.asarray(frac)[:, None]
    w = jnp.where(jnp.asarray(pad), 0, x[..., jnp.asarray(win)])
    return jnp.einsum("...om,om->...o", w, taps).astype(x.dtype)

"""3GPP multipath fading emulator: EPA/EVA/ETU with Doppler (fading.c).

Reference behavior: lib/src/phy/channel/fading.c — tap tables (:33-35, the
3GPP 36.101/36.104 Annex B.2 profiles), Rayleigh tap processes with Doppler,
FFT-domain convolution per block (:111,165).

TPU-first: tap gains follow the Jakes sum-of-sinusoids model evaluated for
ALL blocks at once ([n_blocks, n_taps] einsum); convolution is overlap-save —
batched FFTs over [n_blocks, nfft] with a static halo, so an arbitrarily long
stream is one device dispatch.  Fractional tap delays are exact (frequency-
domain phase ramps), where the reference rounds to the sample grid.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

# 3GPP TS 36.101/36.104 Annex B.2.1 tap models: (delay ns, power dB)
PROFILES = {
    "epa": ([0, 30, 70, 90, 110, 190, 410],
            [0.0, -1.0, -2.0, -3.0, -8.0, -17.2, -20.8]),
    "eva": ([0, 30, 150, 310, 370, 710, 1090, 1730, 2510],
            [0.0, -1.5, -1.4, -3.6, -0.6, -9.1, -7.0, -12.0, -16.9]),
    "etu": ([0, 50, 120, 200, 230, 500, 1600, 2300, 5000],
            [-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, -3.0, -5.0, -7.0]),
    "none": ([0], [0.0]),  # single LOS tap (for delay-only tests)
}

N_SINUSOIDS = 16


@dataclass(frozen=True)
class FadingChannel:
    """Block fading emulator for one (profile, doppler, srate) bucket."""

    profile: str
    doppler_hz: float
    srate: int
    block: int = 2048  # processing block (output samples per FFT)
    seed: int = 0

    @functools.cached_property
    def _taps(self):
        delays_ns, powers_db = PROFILES[self.profile]
        d = np.asarray(delays_ns, np.float64) * 1e-9 * self.srate  # samples
        p = 10 ** (np.asarray(powers_db, np.float64) / 10)
        p = p / p.sum()
        return d, np.sqrt(p)

    @property
    def halo(self) -> int:
        """Overlap-save halo covering the maximum delay spread."""
        d, _ = self._taps
        return int(np.ceil(d.max())) + 1

    @functools.cached_property
    def _jakes(self):
        """Per-tap sum-of-sinusoids parameters (host RNG, static)."""
        rng = np.random.default_rng(self.seed)
        n_taps = len(self._taps[0])
        theta = rng.uniform(0, 2 * np.pi, (n_taps, N_SINUSOIDS))
        phi = rng.uniform(0, 2 * np.pi, (n_taps, N_SINUSOIDS))
        return theta, phi

    def tap_gains(self, t):
        """Rayleigh tap gains at times t [n]: [n, n_taps] complex64."""
        theta, phi = self._jakes
        _, amp = self._taps
        fd = self.doppler_hz
        w = 2 * np.pi * fd * np.cos(theta)  # [taps, N]
        arg = t[:, None, None] * jnp.asarray(w) + jnp.asarray(phi)
        g = jnp.mean(jnp.exp(1j * arg), axis=-1) * np.sqrt(N_SINUSOIDS)
        if self.doppler_hz == 0.0:
            # static channel: a fixed unit-variance complex gain per tap
            g = jnp.exp(1j * jnp.asarray(phi[:, 0]))[None, :] * jnp.ones_like(g)
        return (g * jnp.asarray(amp)).astype(jnp.complex64)

    def __call__(self, x, t0: float = 0.0):
        """Apply the channel to x [n] -> y [n] (same length, causal).

        Quasi-static per block: tap gains are evaluated at each block center
        (fading.c interpolates coefficients per subframe similarly).
        """
        n = x.shape[-1]
        L = self.block
        P = self.halo
        nfft = int(2 ** np.ceil(np.log2(L + P)))
        nblk = -(-n // L)
        xp = jnp.concatenate([jnp.zeros(P, x.dtype), x,
                              jnp.zeros(nblk * L - n, x.dtype)])
        # overlap-save blocks of nfft samples, stride L
        idx = (np.arange(nblk)[:, None] * L
               + np.arange(nfft)[None, :])  # may overrun: pad
        xp = jnp.concatenate([xp, jnp.zeros(idx.max() + 1 - xp.shape[0], x.dtype)])
        blocks = xp[idx]  # [nblk, nfft]
        t = (np.arange(nblk) * L + L / 2) / self.srate + t0
        g = self.tap_gains(jnp.asarray(t))  # [nblk, taps]
        d, _ = self._taps
        f = np.fft.fftfreq(nfft)
        ramp = np.exp(-2j * np.pi * f[None, :] * d[:, None])  # [taps, nfft]
        h = jnp.einsum("bt,tf->bf", g, jnp.asarray(ramp.astype(np.complex64)))
        y = jnp.fft.ifft(jnp.fft.fft(blocks, axis=-1) * h, axis=-1)
        y = y[:, P : P + L].reshape(-1)[:n]
        return y.astype(jnp.complex64)

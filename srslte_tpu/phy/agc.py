"""Software AGC (agc.c equivalent).

Reference behavior: lib/src/phy/agc/agc.c — per-frame RSSI measurement with
exponential tracking toward a target amplitude (srsran_agc_process:217),
gain clamped to [min, max].

TPU-first: the sequential gain recursion over frames is a lax.scan; the
per-frame power reductions are batched.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Agc:
    target: float = 0.3  # target RMS amplitude
    bandwidth: float = 0.7  # tracking speed (0..1]
    min_gain_db: float = -20.0
    max_gain_db: float = 40.0

    def process(self, x, frame_len: int, g0_db: float = 0.0):
        """x [n] -> (y [n] scaled, gain_db [n_frames], rssi [n_frames]).

        Gain applied to frame i is the gain state BEFORE observing it (the
        reference updates hardware gain for the next frame the same way).
        """
        n = x.shape[-1] // frame_len
        frames = x[..., : n * frame_len].reshape(-1, n, frame_len)

        def step(g_db, fr):
            g = 10.0 ** (g_db / 20.0)
            y = fr * g
            rssi = jnp.sqrt(jnp.mean(jnp.abs(y) ** 2, axis=-1))
            err_db = 20.0 * jnp.log10(jnp.maximum(self.target / jnp.maximum(rssi, 1e-9), 1e-9))
            new = jnp.clip(g_db + self.bandwidth * err_db,
                           self.min_gain_db, self.max_gain_db)
            return new, (y, g_db, rssi)

        g0 = jnp.full(frames.shape[0], g0_db, jnp.float32)
        _, (ys, gains, rssi) = jax.lax.scan(step, g0, jnp.moveaxis(frames, 1, 0))
        y = jnp.moveaxis(ys, 0, 1).reshape(x.shape[:-1] + (-1,))
        return y[0] if y.shape[0] == 1 and x.ndim == 1 else y, gains.T, rssi.T

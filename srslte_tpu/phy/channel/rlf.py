"""Radio-link-failure burst generator (rlf.c equivalent).

Reference behavior: lib/src/phy/channel/rlf.c — periodically zeroes the
signal for t_off out of every t_on + t_off milliseconds (fault injection for
radio-link-monitoring tests, SURVEY.md §5.3).
"""

from __future__ import annotations

import jax.numpy as jnp


def rlf_mask(n: int, srate: int, t_on_ms: float, t_off_ms: float, t0_s: float = 0.0):
    """[n] float mask: 1 during on-periods, 0 during the off bursts."""
    t = (jnp.arange(n) / srate + t0_s) * 1e3  # ms
    period = t_on_ms + t_off_ms
    return (jnp.mod(t, period) < t_on_ms).astype(jnp.float32)

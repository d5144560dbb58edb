"""Layer mapping, transmit diversity and equalization (36.211 §6.3.3-4).

Reference behavior: lib/src/phy/mimo/{layermap.c, precoding.c}.  Supported in
this round: single-port (TM1) passthrough with ZF/MMSE equalization, and
2-port SFBC transmit diversity (TM2 / PBCH / PDCCH) per 36.211 §6.3.4.3:

    port0: [ x0,  x1 ]      port1: [ -x1*, x0* ]   (pairs of subcarriers,
    with 1/sqrt(2) scaling at the transmitter)

Everything is elementwise over RE pairs -> pure VPU math, batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def layermap_single(symbols):
    return symbols


def layerdemap_single(symbols):
    return symbols


def equalize_zf(y, h):
    """Zero-forcing 1x1: x = y / h (precoding.c srsran_predecoding_single)."""
    return y * jnp.conj(h) / jnp.maximum(jnp.abs(h) ** 2, 1e-12)


def equalize_mmse(y, h, noise_var):
    """MMSE 1x1: x = conj(h) y / (|h|^2 + sigma^2).

    noise_var broadcasts against y's batch dims (precoding.c:841+ semantics;
    output is the symbol estimate, consistent with unit-energy constellations).
    """
    return y * jnp.conj(h) / (jnp.abs(h) ** 2 + noise_var)


def alamouti_encode_2tx(x):
    """SFBC: x [..., n] (n even) -> per-port symbols [..., 2, n].

    36.211 §6.3.4.3 with the reference's pairing over adjacent REs
    (precoding.c srsran_precoding_diversity, 2 ports).
    """
    x0, x1 = x[..., 0::2], x[..., 1::2]
    p0 = jnp.stack([x0, x1], axis=-1).reshape(x.shape)
    p1 = jnp.stack([-jnp.conj(x1), jnp.conj(x0)], axis=-1).reshape(x.shape)
    return jnp.stack([p0, p1], axis=-2) / jnp.sqrt(2.0)


def alamouti_decode_2tx(y, h0, h1, noise_var=0.0):
    """SFBC combine: y [..., n], per-port channels h0/h1 [..., n] -> x [..., n].

    Standard Alamouti combining over RE pairs (precoding.c
    srsran_predecoding_diversity): for pair (y_a, y_b):
      x0 = (h0a* y_a + h1b y_b*) / (|h0|^2+|h1|^2) * sqrt(2)
      x1 = (h1a* y_a - h0b y_b*)... using per-RE channel of each pair member.
    The sqrt(2) undoes the TX scaling.
    """
    ya, yb = y[..., 0::2], y[..., 1::2]
    h0a, h0b = h0[..., 0::2], h0[..., 1::2]
    h1a, h1b = h1[..., 0::2], h1[..., 1::2]
    # y_a = (h0 x0 - h1 x1*)/sqrt2 ; y_b = (h0 x1 + h1 x0*)/sqrt2
    # => x0 = sqrt2 (h0a* y_a + h1b y_b*) / (|h0|^2+|h1|^2)
    #    x1 = sqrt2 (h0b* y_b - h1a y_a*) / (|h0|^2+|h1|^2)
    # (assumes h approx. constant over the pair, as does the reference)
    denom = (jnp.abs(h0a) ** 2 + jnp.abs(h1a) ** 2) / 2 \
        + (jnp.abs(h0b) ** 2 + jnp.abs(h1b) ** 2) / 2 + noise_var
    denom = jnp.maximum(denom, 1e-12)
    x0 = (jnp.conj(h0a) * ya + h1b * jnp.conj(yb)) / denom
    x1 = (jnp.conj(h0b) * yb - h1a * jnp.conj(ya)) / denom
    out = jnp.stack([x0, x1], axis=-1).reshape(y.shape)
    return out * jnp.sqrt(2.0)

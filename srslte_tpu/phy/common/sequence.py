"""LTE Gold (pseudo-random) sequence generation, 36.211 §7.2.

Reference behavior: lib/src/phy/common/sequence.c (srsran_sequence_LTE_pr).
The construction here is TPU-first rather than a port: the 31-bit LFSR state
words double as 31-output blocks (output bit c(n) = x1(n) ^ x2(n), and the low
bit of the state IS the next output), so generation is a scan over ceil(len/31)
block steps of pure uint32 bitwise ops.  Host-side (numpy) generation is used
for config-time tables (seeds are known per cell/RNTI/subframe); a jittable
generator is provided for on-device dynamic seeds.

Sign convention (sequence.c:360): bit 0 -> +1.0, bit 1 -> -1.0.
"""

from __future__ import annotations

import functools

import numpy as np

NC = 1600  # fast-forward length per 36.211 §7.2

_M28 = (1 << 28) - 1
_M31 = (1 << 31) - 1


def _x1_step(s: int) -> int:
    """Advance x1 state (bits x(n)..x(n+30)) one step: x(n+31)=x(n+3)^x(n)."""
    new = ((s >> 3) ^ s) & 1
    return (s >> 1) | (new << 30)


def _x2_step(s: int) -> int:
    """x2(n+31) = x2(n+3)^x2(n+2)^x2(n+1)^x2(n)."""
    new = ((s >> 3) ^ (s >> 2) ^ (s >> 1) ^ s) & 1
    return (s >> 1) | (new << 30)


def _x1_step31(s):
    """Advance x1 31 steps: the new state's 31 bits are x(n+31)..x(n+61).

    Works elementwise on python ints or uint32 numpy/jax arrays.
    """
    new = ((s >> 3) ^ s) & _M28  # bits x(n+31..n+58)
    new = new | ((((s >> 28) ^ new) & 0x7) << 28)  # x(n+59..61) use fresh bits
    return new & _M31


def _x2_step31(s):
    new = ((s >> 3) ^ (s >> 2) ^ (s >> 1) ^ s) & _M28  # bits x(n+31..n+58)
    # bits x(n+59..61) at positions 28..30 reuse fresh bits new_0..new_2:
    #   pos28 = new0^s28^s29^s30, pos29 = new0^new1^s29^s30, pos30 = new0^new1^new2^s30
    hi = ((new << 28) ^ (new << 29) ^ (new << 30) ^ s ^ (s >> 1) ^ (s >> 2)) & (0x7 << 28)
    return (new | hi) & _M31


@functools.lru_cache(maxsize=1)
def _x1_nc_state() -> int:
    s = 1  # x1 init: x1(0)=1, rest 0
    for _ in range(NC):
        s = _x1_step(s)
    return s


@functools.lru_cache(maxsize=None)
def _x2_nc_state(seed: int) -> int:
    s = int(seed) & _M31
    for _ in range(NC):
        s = _x2_step(s)
    return s


def gold_sequence(seed: int, length: int) -> np.ndarray:
    """Generate c(0..length-1) as uint8 bits (host/numpy, config-time)."""
    nblocks = -(-length // 31)
    x1 = _x1_nc_state()
    x2 = _x2_nc_state(seed)
    words = np.empty(nblocks, dtype=np.uint32)
    for i in range(nblocks):
        words[i] = x1 ^ x2
        x1 = _x1_step31(x1)
        x2 = _x2_step31(x2)
    # unpack 31 LSB-first bits per word
    bits = (words[:, None] >> np.arange(31, dtype=np.uint32)[None, :]) & 1
    return bits.reshape(-1)[:length].astype(np.uint8)


def gold_sequence_signed(seed: int, length: int) -> np.ndarray:
    """+1.0 for bit 0, -1.0 for bit 1 (sequence.c:360 convention)."""
    return (1.0 - 2.0 * gold_sequence(seed, length)).astype(np.float32)


def gold_sequence_jax(seed, length: int):
    """Jittable Gold sequence for traced seeds; length is static.

    Returns uint8 bits of shape [length].  The Nc fast-forward runs as a
    fori_loop of cheap scalar bitwise ops; generation is a scan emitting
    31-bit blocks.
    """
    import jax
    import jax.numpy as jnp

    def x1_step(s):
        return ((s >> 1) | ((((s >> 3) ^ s) & 1) << 30)) & _M31

    def x2_step(s):
        return ((s >> 1) | ((((s >> 3) ^ (s >> 2) ^ (s >> 1) ^ s) & 1) << 30)) & _M31

    x1 = jnp.uint32(_x1_nc_state())  # x1 init is seed-independent: bake it in
    x2 = jnp.asarray(seed, jnp.uint32) & _M31
    x2 = jax.lax.fori_loop(0, NC, lambda _, s: x2_step(s), x2)

    nblocks = -(-length // 31)

    def block(carry, _):
        x1, x2 = carry
        word = x1 ^ x2
        return (_x1_step31(x1), _x2_step31(x2)), word

    _, words = jax.lax.scan(block, (x1, x2), None, length=nblocks)
    bits = (words[:, None] >> jnp.arange(31, dtype=jnp.uint32)[None, :]) & 1
    return bits.reshape(-1)[:length].astype(jnp.uint8)

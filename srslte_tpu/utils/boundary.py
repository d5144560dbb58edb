"""Host<->device boundary helpers.

The axon TPU runtime cannot transfer complex64 across the host boundary
(UNIMPLEMENTED), so complex arrays cross as float32 (..., 2) (re, im) pairs
and are (re)assembled on the correct side.  Inside jit, complex math is fully
supported — only the transfer is restricted.
"""

from __future__ import annotations

import numpy as np


def to_device_complex(x: np.ndarray):
    """Host complex ndarray -> device complex64 array (float-pair transfer)."""
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    pairs = np.stack([x.real, x.imag], axis=-1).astype(np.float32)
    return jax.jit(lambda a: jax.lax.complex(a[..., 0], a[..., 1]))(
        jnp.asarray(pairs))


def from_device_complex(x) -> np.ndarray:
    """Device complex array -> host complex64 ndarray (float-pair transfer)."""
    import jax
    import jax.numpy as jnp

    pairs = jax.jit(lambda a: jnp.stack([a.real, a.imag], axis=-1))(x)
    p = np.asarray(pairs)
    return (p[..., 0] + 1j * p[..., 1]).astype(np.complex64)

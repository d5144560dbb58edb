"""Lazy jit wrapper for library entry points.

Two reasons every public device-path function goes through this:
- one dispatch per call instead of per-op (the axon tunnel charges ~tens of
  ms per dispatch, and eager complex ops are UNIMPLEMENTED there);
- config objects (frozen dataclasses) become static arguments, so each
  (cell, grant, ...) bucket compiles once, matching the bucketing design.

jax is imported on first call, keeping host-only imports light.
"""

from __future__ import annotations

import functools


def lazy_jit(fn=None, **jit_kwargs):
    """Decorator: jax.jit applied on first call (supports static_arg*)."""
    if fn is None:
        return lambda f: lazy_jit(f, **jit_kwargs)
    cache = {}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import jax

        if "jitted" not in cache:
            cache["jitted"] = jax.jit(fn, **jit_kwargs)
        return cache["jitted"](*args, **kwargs)

    wrapper.__wrapped__ = fn
    return wrapper

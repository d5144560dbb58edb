"""Device mesh construction for the sharded PHY.

The reference's parallelism axes (SURVEY.md §2.7) map onto named mesh axes:
per-carrier cc_workers -> "carrier" (data parallel), pipelined subframe
workers -> batched time blocks (a leading array axis, ordered by
construction rather than a tti_semaphore), SIMD lanes -> VPU lanes inside
kernels.  Multi-host layouts add an outer "host" axis so collectives ride
ICI within a host slice and DCN across.
"""

from __future__ import annotations

import numpy as np


def make_mesh(axis_sizes: dict, devices=None):
    """Build a Mesh with named axes, e.g. make_mesh({"carrier": 8}).

    axis_sizes values may use -1 once to absorb all remaining devices.
    """
    import jax
    from jax.sharding import Mesh

    devices = list(devices if devices is not None else jax.devices())
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"need {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(arr, names)

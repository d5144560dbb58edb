"""Overlap-save halo exchange over the mesh (SURVEY.md §5.7 / BASELINE north star).

The reference keeps streaming windows with overlap so PSS correlation can
span buffer boundaries (ue_sync.c:697-724).  Sharded over devices, the same
pattern becomes: split the stream into per-device time chunks, fetch the head
of the RIGHT neighbor's chunk via an ICI collective (ppermute), correlate
locally — one `shard_map`, no host round trips.
"""

from __future__ import annotations

import functools

import numpy as np


def halo_extend(x_local, halo: int, axis_name: str):
    """Inside shard_map: extend local chunk [..., L] with the next shard's
    head [..., halo].  The last shard wraps to shard 0 (callers mask or size
    the stream so the wrap region is padding)."""
    import jax
    import jax.numpy as jnp

    n = jax.lax.axis_size(axis_name)
    head = x_local[..., :halo]
    # send my head to my LEFT neighbor (i receives from i+1)
    perm = [((i + 1) % n, i) for i in range(n)]
    recv = jax.lax.ppermute(head, axis_name, perm)
    return jnp.concatenate([x_local, recv], axis=-1)


def sharded_pss_search(samples, fft_size: int, mesh, axis: str = "t"):
    """PSS search over a stream sharded across mesh axis `axis`.

    samples: [N] complex64, N divisible by the axis size.  Each device
    searches its chunk (+halo) for all 3 N_id_2; a final argmax over the
    all-gathered per-shard peaks gives the global (n_id_2, offset, metric) —
    identical to the unsharded pss_find_peak over the full stream, except
    within `fft_size` of the very end (wrap region).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    from ..phy.sync.pss import pss_find

    halo = fft_size  # covers a correlation window crossing the boundary

    def local(x):
        ext = halo_extend(x, halo, axis)
        p = pss_find(ext, fft_size)  # [3, L+1] local correlation
        flat = p.reshape(-1)
        am = jnp.argmax(flat)
        nvalid = p.shape[-1]
        nid2 = (am // nvalid).astype(jnp.int32)
        off = (am % nvalid).astype(jnp.int32)
        metric = flat[am]
        # gather each shard's winner to every shard, then pick globally
        i = jax.lax.axis_index(axis)
        all_m = jax.lax.all_gather(metric, axis)
        all_o = jax.lax.all_gather(off, axis)
        all_n = jax.lax.all_gather(nid2, axis)
        win = jnp.argmax(all_m)
        chunk = x.shape[-1]
        g_off = win * chunk + all_o[win]
        return (all_n[win][None], g_off.astype(jnp.int32)[None],
                all_m[win][None])

    fn = shard_map(local, mesh=mesh, in_specs=P(axis),
                   out_specs=(P(axis), P(axis), P(axis)))
    n_id_2, off, metric = jax.jit(fn)(samples)
    return n_id_2[0], off[0], metric[0]

"""Combined PSS+SSS synchronization (sync.c equivalent).

Reference behavior: lib/src/phy/sync/sync.c srsran_sync_find (:442): PSS
matched filter over the window, CFO estimate from the PSS symbol, SSS decode
one symbol earlier, cell id = 3*N_id_1 + N_id_2.

TPU-first: one jittable function over batched windows; all three N_id_2
hypotheses and all 168 N_id_1 x {sf0, sf5} hypotheses are evaluated by the
batched kernels in pss.py / sss.py; peak selection is argmax + gathers, so
cell search over many windows is a single device dispatch (the reference
loops hypotheses serially, ue_cell_search.c:260).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ...utils.jit import lazy_jit
from ..common.params import OfdmParams
from .cfo import cfo_correct
from .pss import pss_cfo_compute, pss_find_peak
from .sss import sss_find


class SyncResult(NamedTuple):
    n_id_2: object  # int32 [...]
    n_id_1: object  # int32 [...] (-1 when SSS invalid)
    cell_id: object  # int32 [...]
    sf5: object  # bool [...]: True if the detected half-frame is subframe 5
    peak_offset: object  # int32 [...]: start of the PSS symbol (no CP)
    sf_start: object  # int32 [...]: start of subframe 0/5 (SSS subframe)
    cfo: object  # float32 [...], subcarrier units
    pss_metric: object  # float32 [...]
    sss_metric: object  # float32 [...]
    tdd: object = False  # bool [...]: frame structure type 2 detected


@lazy_jit(static_argnums=(1, 2))
def sync_find(samples, params: OfdmParams,
              frame_type: str = "fdd") -> SyncResult:
    """Find PSS/SSS in windows [..., L] sampled at params.srate.

    L should cover >= 1 subframe + 1 symbol of margin so the SSS symbol
    preceding a detected PSS is inside the window; detection near the very
    start of the window clamps (metric will reflect the bad fit).

    frame_type: "fdd" reads the SSS one symbol before the PSS (36.211 type
    1); "tdd" reads it three symbols back — SSS closes subframe 0/5 and the
    PSS sits in symbol 2 of subframe 1/6 (type 2); "auto" decodes both
    hypotheses and keeps the better SSS correlation, like the reference's
    blind frame-type detection (sync.c srsran_sync_set_frame_type /
    ue_sync.c frame_type detection loop).
    """
    import jax
    import jax.numpy as jnp

    n = params.symbol_sz
    cp1 = params.cp_lens_slot()[0]  # first-symbol CP
    cp2 = params.cp_lens_slot()[1]  # other-symbol CP
    slot = params.slot_len

    n_id_2, offset, pss_metric = pss_find_peak(samples, n)
    # SSS symbol start relative to the PSS symbol start per frame type
    d_fdd = cp2 + n
    d_tdd = cp1 + 2 * cp2 + 3 * n

    def sss_at(x, off, nid2, cfo, delta):
        sss_start = jnp.maximum(off - delta, 0)
        sss_sym = jax.lax.dynamic_slice_in_dim(x, sss_start, n, axis=-1)
        sss_sym = cfo_correct(sss_sym, cfo, n)
        bins = jnp.fft.fft(sss_sym)
        d = jnp.concatenate([bins[n - 31 :], bins[1:32]])
        return sss_find(d, nid2)

    def per_window(x, nid2, off):
        # PSS symbol -> CFO
        pss_sym = jax.lax.dynamic_slice_in_dim(x, off, n, axis=-1)
        cfo = pss_cfo_compute(pss_sym, nid2, n)
        if frame_type == "fdd":
            n_id_1, sf5, m = sss_at(x, off, nid2, cfo, d_fdd)
            return cfo, n_id_1, sf5, m, jnp.asarray(False)
        if frame_type == "tdd":
            n_id_1, sf5, m = sss_at(x, off, nid2, cfo, d_tdd)
            return cfo, n_id_1, sf5, m, jnp.asarray(True)
        i1f, s5f, mf = sss_at(x, off, nid2, cfo, d_fdd)
        i1t, s5t, mt = sss_at(x, off, nid2, cfo, d_tdd)
        tdd = mt > mf
        return (cfo, jnp.where(tdd, i1t, i1f), jnp.where(tdd, s5t, s5f),
                jnp.maximum(mf, mt), tdd)

    batch = samples.shape[:-1]
    if batch:
        fn = per_window
        for _ in batch:
            fn = jax.vmap(fn)
        cfo, n_id_1, sf5, sss_metric, tdd = fn(samples, n_id_2, offset)
    else:
        cfo, n_id_1, sf5, sss_metric, tdd = per_window(samples, n_id_2,
                                                       offset)

    # FDD: PSS closes slot 0 of subframe 0/5 -> its subframe starts one
    # slot minus (symbol without CP) before the PSS start.  TDD: the SSS
    # subframe 0/5 ENDS right after the SSS symbol, i.e. at
    # offset - d_tdd + n, so it starts one subframe earlier.
    sf_fdd = offset + n - slot
    sf_tdd = offset - d_tdd + n - params.sf_len
    sf_start = jnp.where(tdd, sf_tdd, sf_fdd) if frame_type == "auto" else \
        (sf_tdd if frame_type == "tdd" else sf_fdd)
    cell_id = jnp.where(n_id_1 >= 0, 3 * n_id_1 + n_id_2, -1)
    return SyncResult(n_id_2, n_id_1, cell_id.astype(np.int32), sf5,
                      offset, sf_start, cfo, pss_metric, sss_metric, tdd)

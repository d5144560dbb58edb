"""Cell search over a sample stream (ue_cell_search.c equivalent).

Reference behavior: lib/src/phy/ue/ue_cell_search.c srsran_ue_cellsearch_scan
(:260): loop 3 N_id_2 hypotheses x N 5-ms windows, count peak agreement, pick
the mode.

TPU-first: the stream is reshaped into a batch of half-frame windows (plus a
one-symbol halo so the SSS preceding an end-of-window PSS stays visible) and
sync_find evaluates every window and every hypothesis in ONE dispatch; the
"vote" is a segment-sum over detected cell ids.  Runs at the 1.4 MHz search
bandwidth (6 PRB / 128-point FFT) like the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ...utils.jit import lazy_jit
from ..common.params import OfdmParams
from ..sync.sync import SyncResult, sync_find

HALF_FRAME_MS = 5


class CellSearchResult(NamedTuple):
    cell_id: object  # int32 scalar (-1 if nothing found)
    n_id_1: object
    n_id_2: object
    cfo: object  # float32, subcarrier units
    peak_offset: object  # int32: PSS symbol start within the stream
    votes: object  # int32: windows agreeing on cell_id
    metric: object  # float32: mean PSS metric of agreeing windows
    tdd: object = False  # bool: frame structure type 2 (majority vote)


@lazy_jit(static_argnums=(1, 2))
def cell_search(samples, params: OfdmParams | None = None,
                frame_type: str = "fdd") -> CellSearchResult:
    """Search a 1-D sample stream [L] for the strongest cell.

    The stream is cut into floor(L/half_frame)-1 overlapping windows of
    half_frame + margin samples, so every PSS occurrence lands fully inside
    some window.  All windows are processed batched; the result is the
    majority cell id among windows whose SSS decoded to a valid N_id_1.
    """
    import jax.numpy as jnp

    p = params or OfdmParams(6)
    half = p.srate * HALF_FRAME_MS // 1000
    margin = p.symbol_sz * 4
    n_win = int(samples.shape[-1]) // half - 1
    if n_win < 1:
        raise ValueError("need at least 2 half-frames of samples")
    idx = (np.arange(n_win)[:, None] * half + np.arange(half + margin)[None, :])
    wins = samples[..., idx]  # [n_win, half+margin]

    r: SyncResult = sync_find(wins, p, frame_type)

    valid = r.n_id_1 >= 0
    cid = jnp.where(valid, r.cell_id, 504)
    counts = jnp.zeros(505, jnp.int32).at[cid].add(1)
    best = jnp.argmin(jnp.where(jnp.arange(505) < 504, -counts, 1)).astype(jnp.int32)
    votes = counts[best]
    agree = (r.cell_id == best) & valid
    w = agree.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    cfo = jnp.sum(r.cfo * w) / wsum
    metric = jnp.sum(r.pss_metric * w) / wsum
    # representative timing: the agreeing window with the best PSS metric
    score = jnp.where(agree, r.pss_metric, -1.0)
    k = jnp.argmax(score)
    offset = jnp.asarray(idx[:, 0])[k] + r.peak_offset[k]
    found = votes > 0
    tdd = jnp.sum(jnp.where(agree, r.tdd, False)) * 2 > votes
    return CellSearchResult(
        cell_id=jnp.where(found, best, -1),
        n_id_1=jnp.where(found, best // 3, -1),
        n_id_2=jnp.where(found, best % 3, -1),
        cfo=cfo, peak_offset=offset.astype(jnp.int32),
        votes=votes, metric=metric, tdd=tdd)

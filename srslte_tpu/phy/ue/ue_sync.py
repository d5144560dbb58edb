"""Streaming sample-stream alignment: FIND -> TRACK (ue_sync.c equivalent).

Reference behavior: lib/src/phy/ue/ue_sync.c — srsran_ue_sync_zerocopy (:726):
FIND state runs a full PSS/SSS search; TRACK re-correlates the PSS at the
expected offset each half-frame (:618 track_peak_ok), nudges the sample
offset, tracks CFO (CP + PSS estimates blended), and counts the subframe
index; file-mode replay (:734) reads from a sample source instead of a radio.

TPU-first: the tracker is a pure function over a BLOCK of subframes — the
whole block is CFO-corrected and aligned with one device dispatch, PSS
re-correlation happens only on the subframes that contain PSS (0 and 5), and
the state (offset, cfo, sf counter) advances functionally — where the
reference mutates `srsran_ue_sync_t` per millisecond, this steps
`UeSyncState` per block.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import numpy as np

from ...utils.jit import lazy_jit
from ..common.params import Cell, OfdmParams
from ..sync.cfo import cfo_correct, cfo_estimate_cp
from ..sync.pss import pss_find
from ..sync.sync import sync_find

TRACK_WIN = 8  # +- samples searched around the expected PSS position


@lazy_jit(static_argnums=(1,))
def _slice_prefix(x, n: int):
    return x[..., :n]


@lazy_jit(static_argnums=(3, 4, 5))
def _track_dev(samples, pos, cfo, params: OfdmParams, n_sf: int,
               sync_offsets: tuple):
    """Device side of track_block: one dispatch per block.

    samples: full stream (device); pos, cfo: traced.  sync_offsets: static
    tuple of subframe indices within the block that contain PSS.
    Returns (sfs [n_sf, sf_len], pss_power [n_sync, 3, 2*WIN+1], cp_cfo).
    """
    import jax
    import jax.numpy as jnp

    p = params
    n = p.symbol_sz
    need = n_sf * p.sf_len + TRACK_WIN + n
    raw = jax.lax.dynamic_slice_in_dim(samples, pos, need, axis=-1)
    corr = cfo_correct(raw, cfo, n)
    sfs = jnp.stack([jax.lax.dynamic_slice_in_dim(corr, i * p.sf_len,
                                                  p.sf_len, axis=-1)
                     for i in range(n_sf)])
    pws = []
    for i in sync_offsets:
        exp = i * p.sf_len + p.slot_len - n  # expected PSS start
        win = jax.lax.dynamic_slice_in_dim(corr, exp - TRACK_WIN,
                                           2 * TRACK_WIN + n, axis=-1)
        pws.append(pss_find(win, n, norm=False))
    pss_pw = (jnp.stack(pws) if pws
              else jnp.zeros((0, 3, TRACK_WIN + 1), jnp.float32))
    resid = cfo_estimate_cp(sfs[0], p)
    return sfs, pss_pw, resid


@dataclass(frozen=True)
class UeSyncState:
    cell_id: int
    sf_idx: int  # subframe index of the NEXT subframe to be emitted
    stream_pos: int  # sample index of that subframe in the stream
    cfo: float  # subcarrier units
    in_sync: bool = True
    frames: int = 0  # half-frames tracked


@dataclass(frozen=True)
class UeSync:
    cell: Cell

    @property
    def params(self) -> OfdmParams:
        return self.cell.ofdm

    # -- FIND -----------------------------------------------------------------
    def find(self, samples) -> UeSyncState | None:
        """Full sync over >= 2 half-frames of samples (host glue + 1 dispatch)."""
        p = self.params
        half = p.srate * 5 // 1000
        if samples.shape[-1] < half + p.sf_len:
            raise ValueError("need at least 5 ms + 1 subframe for FIND")
        win = _slice_prefix(samples, half + 4 * p.symbol_sz)
        r = sync_find(win, p)
        if int(np.asarray(r.n_id_1)) < 0:
            return None
        cell_id = int(np.asarray(r.cell_id))
        sf_start = int(np.asarray(r.sf_start))
        sf5 = bool(np.asarray(r.sf5))
        cfo = float(np.asarray(r.cfo))
        # emit from the detected PSS subframe
        return UeSyncState(cell_id=cell_id, sf_idx=5 if sf5 else 0,
                           stream_pos=sf_start, cfo=cfo)

    # -- TRACK ----------------------------------------------------------------
    def track_block(self, samples, state: UeSyncState, n_sf: int):
        """Emit n_sf aligned, CFO-corrected subframes from the stream.

        samples: 1-D array covering [state.stream_pos, ... + n_sf*sf_len + margin].
        Returns (subframes [n_sf, sf_len] complex64 device array, new state).
        One PSS re-correlation per contained sync subframe updates the offset
        estimate; CP-based CFO refines the frequency estimate.
        """
        p = self.params
        n = p.symbol_sz
        pos = state.stream_pos
        need = n_sf * p.sf_len + TRACK_WIN + n
        if samples.shape[-1] < pos + need:
            raise ValueError("not enough samples for the requested block")
        sync_offsets = tuple(i for i in range(n_sf)
                             if (state.sf_idx + i) % 5 == 0)
        sfs, pss_pw, resid = _track_dev(samples, pos, state.cfo, p, n_sf,
                                        sync_offsets)
        # PSS tracking on sync subframes (sf_idx % 5 == 0)
        nid2 = state.cell_id % 3
        pw = np.asarray(pss_pw)[:, nid2]  # [n_sync, 2*WIN+1]
        offs = list(np.argmax(pw, axis=-1) - TRACK_WIN) if len(pw) else []
        drift = int(np.median(offs)) if offs else 0

        # CFO refinement from the CP of the first subframe (residual)
        new_cfo = state.cfo + 0.5 * float(np.asarray(resid))

        in_sync = abs(drift) <= TRACK_WIN
        new = replace(state,
                      sf_idx=(state.sf_idx + n_sf) % 10,
                      stream_pos=pos + n_sf * p.sf_len + drift,
                      cfo=new_cfo,
                      in_sync=in_sync,
                      frames=state.frames + n_sf // 5)
        return sfs, new

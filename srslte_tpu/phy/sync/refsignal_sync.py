"""CRS-based downlink synchronization/finder (refsignal_dl_sync.c).

Reference behavior: lib/src/phy/sync/refsignal_dl_sync.c — generate the
time-domain CRS-only signal for a cell hypothesis, cross-correlate it
against a capture (srsran_refsignal_dl_sync_find_peak:301), report the
peak offset, a peak-to-RMS metric, and the CFO from the phase rotation
between the two slots' correlations (srsran_refsignal_dl_sync_run).

TPU-first: the correlation is one FFT-domain multiply over the whole
capture; all 10 subframe signatures correlate as a batch.
"""

from __future__ import annotations

import functools

import numpy as np

from ..chest.refsignal_dl import put_crs
from ..common.params import Cell
from ..ofdm import Ofdm


@functools.lru_cache(maxsize=None)
def crs_time_signature(cell: Cell, sf_idx: int) -> np.ndarray:
    """[sf_len] time-domain CRS-only subframe (port 0)."""
    import jax.numpy as jnp

    o = cell.ofdm
    grid = jnp.zeros((o.nsymb_sf, o.nof_re), jnp.complex64)
    grid = put_crs(grid, cell, sf_idx, 0)
    return np.asarray(Ofdm(o, normalize=True).tx_sf(grid))


def refsignal_dl_sync_find(samples, cell: Cell, sf_idx: int = 0):
    """Correlate one subframe signature over the capture.

    -> (offset, metric, cfo_hz_norm): `metric` is |peak| / RMS of the
    correlation (reference peak detection); `cfo_hz_norm` is the CFO as a
    fraction of subcarrier spacing, estimated from the slot-half phase
    rotation of the correlation at the peak.
    """
    import jax.numpy as jnp

    sig = crs_time_signature(cell, sf_idx)
    n = samples.shape[-1]
    m = len(sig)
    size = int(2 ** np.ceil(np.log2(n + m)))
    fx = jnp.fft.fft(samples, size)
    fs = jnp.fft.fft(jnp.asarray(sig), size)
    corr = jnp.fft.ifft(fx * jnp.conj(fs), size)[: n - m + 1]
    mag = jnp.abs(corr)
    peak = jnp.argmax(mag)
    rms = jnp.sqrt(jnp.mean(mag**2))
    metric = mag[peak] / jnp.maximum(rms, 1e-12)
    # CFO: correlate each slot half separately at the peak position
    half = m // 2
    seg = jax_dynamic_slice(samples, peak, m)
    c0 = jnp.vdot(jnp.asarray(sig[:half]), seg[:half])
    c1 = jnp.vdot(jnp.asarray(sig[half:]), seg[half:])
    # the two slot-half correlation centers sit half a subframe apart
    # (7.5 symbol durations): phase = 2*pi * cfo_norm * 7.5, so the
    # unambiguous range is |cfo_norm| < 1/15 of the subcarrier spacing —
    # same pull-in as the reference's CP-based fine CFO stage
    phase = jnp.angle(c1 * jnp.conj(c0))
    cfo_norm = phase / (2 * np.pi * 7.5)
    return int(np.asarray(peak)), float(np.asarray(metric)), \
        float(np.asarray(cfo_norm))


def jax_dynamic_slice(x, start, length):
    import jax

    return jax.lax.dynamic_slice_in_dim(x, start, length, axis=-1)


def cell_find(samples, n_prb: int, cell_ids, sf_idx: int = 0,
              threshold: float = 6.0):
    """Try a set of cell-id hypotheses; return (cell_id, offset, metric)
    of the best above threshold, else None (dl_sync cell-finder loop)."""
    best = None
    for cid in cell_ids:
        cell = Cell(n_prb=n_prb, id=cid, nof_ports=1)
        off, metric, _ = refsignal_dl_sync_find(samples, cell, sf_idx)
        if metric >= threshold and (best is None or metric > best[2]):
            best = (cid, off, metric)
    return best

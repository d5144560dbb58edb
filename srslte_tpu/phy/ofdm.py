"""OFDM modulation/demodulation with cyclic prefix — TPU-native.

Reference behavior: lib/src/phy/dft/ofdm.c (srsran_ofdm_tx_sf / rx_sf), incl.
the RE<->FFT-bin mirror mapping (ofdm_tx_slot / ofdm_rx_slot), unnormalized
FFTW convention with optional 1/sqrt(N) normalization, the DC carrier skip
(dc=1 unless a fractional freq shift is configured), and the per-symbol
fractional frequency shift exp(j*2*pi*(t-cp)/N * f) used for the UL
half-subcarrier offset (srsran_ofdm_set_freq_shift, ofdm.c:334-362).

TPU-first design: instead of the reference's per-symbol strided FFTW guru
plans, a subframe is one batched FFT of shape [..., nsymb_sf, N] plus two
static gathers (CP insert / strip are index maps precomputed at trace time).
Everything vectorizes over arbitrary leading batch dims (subframes, carriers,
antennas) so many subframes are modulated per XLA dispatch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .common.params import CP, OfdmParams


@dataclass(frozen=True)
class Ofdm:
    """Static-shape OFDM modem for one (n_prb, cp) bucket.

    normalize=False matches the DL convention (enb_dl.c:57, ue_dl.c:92):
    forward FFT and backward FFT are both unnormalized (FFTW), so a tx->rx
    round trip scales by N.  normalize=True applies 1/sqrt(N) each way (the
    UL convention, ue_ul.c:62).
    """

    params: OfdmParams
    normalize: bool = False
    freq_shift: float = 0.0  # in units of subcarrier spacing (UL: +0.5 tx / -0.5 rx)
    keep_dc: bool = False

    # -- static tables ------------------------------------------------------
    @property
    def dc(self) -> int:
        return 0 if (self.keep_dc or self.freq_shift != 0.0) else 1

    @functools.cached_property
    def _cp_lens_sf(self) -> np.ndarray:
        return np.array(self.params.cp_lens_slot() * 2, dtype=np.int32)

    @functools.cached_property
    def _cp_insert_idx(self) -> np.ndarray:
        """[sf_len] -> index into flattened [nsymb_sf*N] IFFT output."""
        p = self.params
        idx = np.empty(p.sf_len, dtype=np.int32)
        pos = 0
        for i, cp in enumerate(self._cp_lens_sf):
            n = p.symbol_sz
            t = np.arange(cp + n)
            idx[pos : pos + cp + n] = i * n + (t - cp) % n
            pos += cp + n
        assert pos == p.sf_len
        return idx

    @functools.cached_property
    def _cp_strip_idx(self) -> np.ndarray:
        """[nsymb_sf, N] -> index into input samples [sf_len] (skips CPs)."""
        p = self.params
        offs = np.array(p.symbol_offsets_slot(), dtype=np.int64)
        starts = np.concatenate([offs, offs + p.slot_len]) + self._cp_lens_sf
        return (starts[:, None] + np.arange(p.symbol_sz)[None, :]).astype(np.int32)

    @functools.cached_property
    def _shift_buffer(self) -> np.ndarray | None:
        """Per-sample fractional frequency shift (ofdm.c:347-356)."""
        if self.freq_shift == 0.0:
            return None
        p = self.params
        buf = np.empty(p.sf_len, dtype=np.complex64)
        pos = 0
        for cp in self._cp_lens_sf:
            n = p.symbol_sz
            t = np.arange(cp + n, dtype=np.float64)
            buf[pos : pos + cp + n] = np.exp(2j * np.pi * (t - cp) * self.freq_shift / n)
            pos += cp + n
        return buf

    @functools.cached_property
    def _re_to_bin(self) -> np.ndarray:
        """[nof_re] -> FFT bin index (mirror map, ofdm_tx_slot)."""
        p, dc = self.params, self.dc
        half = p.nof_re // 2
        lo = np.arange(p.symbol_sz - half, p.symbol_sz)  # grid[0:half] -> top bins
        hi = np.arange(dc, dc + half)  # grid[half:] -> bins dc..
        return np.concatenate([lo, hi]).astype(np.int32)

    # -- data path ----------------------------------------------------------
    def tx_sf(self, grid: jax.Array) -> jax.Array:
        """RE grid [..., nsymb_sf, nof_re] -> time samples [..., sf_len]."""
        p = self.params
        n = p.symbol_sz
        bins = jnp.zeros(grid.shape[:-1] + (n,), dtype=jnp.complex64)
        bins = bins.at[..., jnp.asarray(self._re_to_bin)].set(grid.astype(jnp.complex64))
        # unnormalized backward FFT (FFTW convention): ifft * N
        scale = jnp.sqrt(jnp.float32(n)) if self.normalize else jnp.float32(n)
        sym = jnp.fft.ifft(bins, axis=-1) * scale
        flat = sym.reshape(sym.shape[:-2] + (p.nsymb_sf * n,))
        out = flat[..., jnp.asarray(self._cp_insert_idx)]
        if self._shift_buffer is not None:
            out = out * jnp.asarray(self._shift_buffer)
        return out

    def rx_sf(self, samples: jax.Array) -> jax.Array:
        """Time samples [..., sf_len] -> RE grid [..., nsymb_sf, nof_re]."""
        p = self.params
        n = p.symbol_sz
        if self._shift_buffer is not None:
            samples = samples * jnp.asarray(self._shift_buffer)
        sym = samples[..., jnp.asarray(self._cp_strip_idx)]  # [..., nsymb_sf, N]
        bins = jnp.fft.fft(sym, axis=-1)
        if self.normalize:
            bins = bins * (1.0 / np.sqrt(n))
        return bins[..., jnp.asarray(self._re_to_bin)].astype(jnp.complex64)


def ofdm_tx(params: OfdmParams, grid, **kw):
    return Ofdm(params, **kw).tx_sf(grid)


def ofdm_rx(params: OfdmParams, samples, **kw):
    return Ofdm(params, **kw).rx_sf(samples)

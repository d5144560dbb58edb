"""PRACH: random-access preamble generation and detection (36.211 §5.7).

Reference behavior: lib/src/phy/phch/prach.c — ZC root sequences of length
839 (formats 0-3), cyclic shifts from the zeroCorrelationZoneConfig N_cs
table, baseband generation via freq-domain mapping at 1.25 kHz spacing
(srsran_prach_gen:359), detection by freq-domain correlation against each
root + IFFT peak search over shift regions (srsran_prach_detect:702,
corr :467).

TPU-first: detection correlates against ALL configured roots at once (one
[nroots, 839] multiply + batched IFFT) and scores every cyclic-shift region
with a segment-max — no per-root/per-shift loops.  Root sequence indices are
LOGICAL (36.211 table 5.7.2-4, shipped as prach_roots.npz — see
tools/extract_prach_roots.py).  Current limits vs the reference: formats 0-3
long preambles only (no format 4), unrestricted sets only (no high-speed
restricted cyclic shifts).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np

from ..common.params import OfdmParams
from ..common.zc import zadoff_chu

_ROOTS_NPZ = os.path.join(os.path.dirname(__file__), "prach_roots.npz")


@functools.lru_cache(maxsize=1)
def logical_roots() -> np.ndarray:
    """36.211 table 5.7.2-4: logical index -> physical root u (838 entries)."""
    return np.load(_ROOTS_NPZ)["long"].astype(np.int64)

NZC = 839
DELTA_F_RA = 1250  # Hz
K = 12  # 15000 / 1250
PHI = 7  # formats 0-3
# T_cp and T_seq in units of Ts = 1/30.72e6 (36.211 table 5.7.1-1)
FORMAT_CP = {0: 3168, 1: 21024, 2: 6240, 3: 21024}
FORMAT_SEQ = {0: 24576, 1: 24576, 2: 2 * 24576, 3: 2 * 24576}

# N_cs unrestricted sets, formats 0-3 (36.211 table 5.7.2-2)
NCS_UNRESTRICTED = (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119, 167, 279, 419)


@dataclass(frozen=True)
class PrachConfig:
    params: OfdmParams  # cell UL numerology (sets the sample rate)
    root_seq_idx: int = 0  # LOGICAL root sequence index (rootSequenceIndex)
    zero_corr_cfg: int = 4  # index into the N_cs table
    freq_offset_prb: int = 0  # n_PRB_RA offset from the band edge
    fmt: int = 0

    @property
    def n_cs(self) -> int:
        return NCS_UNRESTRICTED[self.zero_corr_cfg]

    @property
    def shifts_per_root(self) -> int:
        return NZC // self.n_cs if self.n_cs else 1

    @property
    def n_roots(self) -> int:
        return -(-64 // self.shifts_per_root)

    @functools.cached_property
    def roots(self) -> tuple[int, ...]:
        """Physical roots: consecutive LOGICAL indices from root_seq_idx
        mapped through table 5.7.2-4 (prach.c:380 semantics)."""
        tab = logical_roots()
        return tuple(int(tab[(self.root_seq_idx + i) % 838])
                     for i in range(self.n_roots))

    @property
    def srate(self) -> int:
        return self.params.srate

    @property
    def n_fft(self) -> int:
        return self.srate // DELTA_F_RA  # IFFT covering one 0.8 ms sequence

    @property
    def n_cp(self) -> int:
        return FORMAT_CP[self.fmt] * self.srate // 30_720_000

    @property
    def n_seq(self) -> int:
        return FORMAT_SEQ[self.fmt] * self.srate // 30_720_000

    @property
    def n_total(self) -> int:
        return self.n_cp + self.n_seq

    @functools.cached_property
    def first_bin(self) -> int:
        """First occupied 1.25 kHz bin relative to the UL carrier DC.

        36.211 §5.7.3: k0 = n_PRB_RA*12 - N_RB_UL*6; bin = phi + K*k0 + K/2.
        """
        k0 = self.freq_offset_prb * 12 - self.params.n_prb * 6
        return PHI + K * k0 + K // 2

    def preamble_uv(self, idx: int) -> tuple[int, int]:
        """Preamble index (0..63) -> (root u, shift v)."""
        s = self.shifts_per_root
        return self.roots[idx // s], idx % s


@functools.lru_cache(maxsize=None)
def _root_dft(u: int) -> np.ndarray:
    return np.fft.fft(zadoff_chu(u, NZC)).astype(np.complex64)


def prach_gen(cfg: PrachConfig, preamble_idx: int) -> np.ndarray:
    """Time-domain preamble at the cell sample rate: [n_cp + n_seq] c64."""
    u, v = cfg.preamble_uv(preamble_idx)
    cv = v * cfg.n_cs
    x = zadoff_chu(u, NZC)
    xv = np.roll(x, -cv)
    xf = np.fft.fft(xv)
    bins = np.zeros(cfg.n_fft, np.complex64)
    bins[(cfg.first_bin + np.arange(NZC)) % cfg.n_fft] = xf
    seq = np.fft.ifft(bins).astype(np.complex64)
    rep = 2 if cfg.fmt >= 2 else 1
    seq_full = np.tile(seq, rep)[: cfg.n_seq]
    out = np.concatenate([seq_full[-cfg.n_cp :], seq_full])
    return (out / np.sqrt(np.mean(np.abs(out) ** 2))).astype(np.complex64)


def prach_detect(cfg: PrachConfig, samples, threshold: float = 13.0):
    # threshold calibration: correlation noise is ~exp(1) after normalization,
    # so the per-window false-alarm rate is ~NZC * exp(-threshold) (2e-3 @ 13)
    """Detect preambles in a window starting at the PRACH CP start.

    samples [..., >= n_total] at the cell rate.  Returns
    (detected [..., 64] bool, metric [..., 64], t_offset [..., 64] int32 in
    samples at the cell rate).  metric is peak power over the mean power of
    the correlation (prach.c uses a comparable peak/side-lobe ratio).
    """
    import jax.numpy as jnp

    n = cfg.n_fft
    seq = samples[..., cfg.n_cp : cfg.n_cp + n]  # one sequence period
    bins = jnp.fft.fft(seq, axis=-1)
    occ = (cfg.first_bin + np.arange(NZC)) % n
    y = bins[..., jnp.asarray(occ)]  # [..., 839]
    roots = jnp.asarray(np.stack([_root_dft(u) for u in cfg.roots]))
    prod = y[..., None, :] * jnp.conj(roots)  # [..., nroots, 839]
    corr = jnp.fft.ifft(prod, axis=-1)
    p = jnp.abs(corr) ** 2  # [..., nroots, 839]: power vs cyclic lag
    floor = jnp.mean(p, axis=-1, keepdims=True)

    s = cfg.shifts_per_root
    ncs = cfg.n_cs if cfg.n_cs else NZC
    # shift v transmitted => correlation peak at lag (NZC - Cv) mod NZC; a
    # propagation delay of d samples moves it forward by d*NZC/n_fft, so the
    # region for v is [(NZC - Cv) .. (NZC - Cv) + ncs) mod NZC
    lag = (NZC - np.arange(s)[:, None] * ncs + np.arange(ncs)[None, :]) % NZC
    region = p[..., jnp.asarray(lag)]  # [..., nroots, s, ncs]
    peak = jnp.max(region, axis=-1)
    arg = jnp.argmax(region, axis=-1)
    metric = peak / jnp.maximum(floor, 1e-12)[..., 0][..., None]
    det = metric > threshold
    # timing: lag offset within the region -> samples at cell rate
    t_off = (arg * cfg.n_fft / NZC).astype(jnp.int32)

    flat = lambda a: a.reshape(a.shape[:-2] + (-1,))[..., :64]
    return flat(det), flat(metric), flat(t_off)

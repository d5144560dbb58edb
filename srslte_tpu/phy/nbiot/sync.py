"""NB-IoT synchronization signals: NPSS/NSSS (36.211 §10.2.7, npss.c/nsss.c).

Reference behavior: lib/src/phy/sync/{npss.c, nsss.c} — NPSS is a length-11
Zadoff-Chu (root 5) repeated over 11 OFDM symbols of subframe 5 with a
per-symbol cover code; NSSS (subframe 9, even frames) is a length-131 ZC
with root/cyclic-shift encoding the 504 NB cell ids x 4 frame positions.

TPU-first: NPSS detection is one batched FFT correlation (like pss.py);
NSSS detection correlates against the full [504*4, 132] candidate bank with
a single matmul.
"""

from __future__ import annotations

import functools

import numpy as np

from ..common.params import OfdmParams
from ..common.zc import zadoff_chu

# 36.211 table 10.2.7.1.1-1: NPSS symbol cover code (symbols 3..13)
NPSS_COVER = np.array([1, 1, 1, 1, -1, -1, 1, 1, 1, -1, 1], np.float32)
NPSS_ROOT = 5
NSSS_LEN = 131


@functools.lru_cache(maxsize=1)
def npss_sequence() -> np.ndarray:
    """Frequency-domain NPSS: [11 symbols, 11 subcarriers] complex64."""
    n = np.arange(11)
    d = np.exp(-1j * np.pi * NPSS_ROOT * n * (n + 1) / 11.0)
    return (NPSS_COVER[:, None] * d[None, :]).astype(np.complex64)


@functools.lru_cache(maxsize=1)
def npss_time(fft_size: int = 128) -> np.ndarray:
    """Time-domain NPSS replica over 11 symbols incl. CP: unit energy."""
    p = OfdmParams(6)  # 1.92 Msps numerology; NB-IoT uses one PRB of it
    assert fft_size == p.symbol_sz
    seq = npss_sequence()
    out = []
    cps = (p.cp_lens_slot() * 2)[3:14]  # symbols 3..13 of the subframe
    for i in range(11):
        bins = np.zeros(fft_size, np.complex64)
        bins[1 : 12] = seq[i]  # subcarriers 0..10 of the NB-IoT PRB (+DC off)
        sym = np.fft.ifft(bins)
        out.append(np.concatenate([sym[-cps[i] :], sym]))
    t = np.concatenate(out).astype(np.complex64)
    return (t / np.linalg.norm(t)).astype(np.complex64)


def npss_find(x, fft_size: int = 128):
    """Correlate x [..., L] with the NPSS replica -> (offset, metric)."""
    import jax.numpy as jnp

    rep = npss_time(fft_size)
    L = x.shape[-1]
    nvalid = L - len(rep) + 1
    conv_len = int(2 ** np.ceil(np.log2(L)))
    bank = jnp.asarray(np.conj(np.fft.fft(rep, conv_len)).astype(np.complex64))
    corr = jnp.fft.ifft(jnp.fft.fft(x, conv_len) * bank)[..., :nvalid]
    p = jnp.abs(corr) ** 2
    e = jnp.cumsum(jnp.abs(x) ** 2, axis=-1)
    win = e[..., len(rep) - 1 :] - jnp.concatenate(
        [jnp.zeros_like(e[..., :1]), e[..., : nvalid - 1]], axis=-1)
    pn = p / jnp.maximum(win, 1e-12)
    off = jnp.argmax(pn, axis=-1)
    return off.astype(jnp.int32), jnp.take_along_axis(pn, off[..., None], -1)[..., 0]


@functools.lru_cache(maxsize=1)
def _nsss_bank() -> np.ndarray:
    """[504*4, 132] candidate NSSS sequences (cell id x frame position)."""
    n = np.arange(132)
    np_ = n % NSSS_LEN
    bank = np.zeros((504 * 4, 132), np.complex64)
    # 36.211 §10.2.7.2: u = NID mod 126 + 3, theta_f = 33/132 * (nf/2 mod 4),
    # cyclic shift b_q(n) hadamard cover with q = floor(NID/126)
    had = _hadamard128()
    for nid in range(504):
        u = nid % 126 + 3
        q = nid // 126
        zc = np.exp(-1j * np.pi * u * np_ * (np_ + 1) / NSSS_LEN)
        bq = had[32 * q][n % 128].astype(np.float32)  # rows {0,32,64,96}
        for f in range(4):
            theta = 33.0 / 132.0 * f
            rot = np.exp(-2j * np.pi * theta * n)
            bank[nid * 4 + f] = (bq * rot * zc).astype(np.complex64)
    return bank


def _hadamard128():
    h = np.array([[1.0]])
    while h.shape[0] < 128:
        h = np.block([[h, h], [h, -h]])
    return h


def nsss_sequence(nid: int, frame_pos: int) -> np.ndarray:
    """NSSS d(0..131) for a cell id and (nf/2 mod 4) frame position."""
    return _nsss_bank()[nid * 4 + frame_pos]


def nsss_find(d132):
    """d132 [..., 132] received NSSS REs -> (nid, frame_pos, metric).

    One [2016, 132] matmul against all candidates.
    """
    import jax.numpy as jnp

    bank = jnp.asarray(_nsss_bank())
    corr = jnp.abs(jnp.einsum("...n,cn->...c", d132, jnp.conj(bank))) ** 2
    best = jnp.argmax(corr, axis=-1)
    energy = jnp.sum(jnp.abs(d132) ** 2, axis=-1) * 132
    metric = jnp.take_along_axis(corr, best[..., None], -1)[..., 0] / jnp.maximum(energy, 1e-12)
    return (best // 4).astype(jnp.int32), (best % 4).astype(jnp.int32), metric

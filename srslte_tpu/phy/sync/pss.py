"""PSS generation, matched-filter search, and PSS-based CFO estimation.

Reference behavior: lib/src/phy/sync/pss.c — srsran_pss_generate (freq ZC,
:483), time-domain replica via centered IFFT, srsran_pss_find_pss (:446)
FFT-based matched filter (srsran_conv_fft_cc_run_opt, :464-480), and
srsran_pss_cfo_compute (half-symbol phase method).

TPU-first: the reference searches one N_id_2 at a time with early exit; here
all 3 roots are one batched FFT correlation (the filter bank is a [3, Nfft]
tensor), and many search windows batch over leading dims.  Peak picking is an
argmax, normalization is a cumsum-based sliding energy — no data-dependent
control flow under jit.
"""

from __future__ import annotations

import functools

import numpy as np

from ..common.zc import pss_sequence

PSS_LEN = 62


@functools.lru_cache(maxsize=None)
def pss_time(n_id_2: int, fft_size: int) -> np.ndarray:
    """Time-domain PSS replica for one OFDM symbol (no CP): [fft_size] c64.

    Maps the 62 freq-domain ZC values onto centered bins (DC skipped) exactly
    like the OFDM modulator mirror map (pss.c places d(0..30) at bins 1..31
    and d(31..61) at bins N-31..N-1), then unnormalized IFFT * N / sqrt(62)
    is NOT applied — we keep unit-energy replicas so correlation magnitudes
    are comparable across fft sizes.
    """
    d = pss_sequence(n_id_2)
    bins = np.zeros(fft_size, np.complex64)
    bins[1 : 32] = d[31:]  # d(31..61) -> +1..+31  (upper half above DC)
    bins[fft_size - 31 :] = d[:31]  # d(0..30) -> -31..-1
    t = np.fft.ifft(bins).astype(np.complex64)
    return (t / np.linalg.norm(t)).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _pss_filter_bank(fft_size: int, conv_len: int) -> np.ndarray:
    """conj(FFT) of the 3 replicas zero-padded to conv_len: [3, conv_len]."""
    bank = np.stack([
        np.conj(np.fft.fft(pss_time(n, fft_size), conv_len)) for n in range(3)
    ])
    return bank.astype(np.complex64)


def pss_find(x, fft_size: int, norm: bool = True):
    """Correlate x [..., L] against all 3 PSS roots.

    Returns corr [..., 3, L - fft_size + 1]: corr[..., u, k] =
    |sum_n x[k+n] conj(pss_u[n])|^2, optionally normalized by the sliding
    window energy of x (CFAR-like, mirrors the reference's peak/side-lobe
    normalization intent).
    """
    import jax.numpy as jnp

    L = x.shape[-1]
    nvalid = L - fft_size + 1
    if nvalid <= 0:
        raise ValueError(f"window {L} shorter than fft_size {fft_size}")
    conv_len = int(2 ** np.ceil(np.log2(L)))
    bank = jnp.asarray(_pss_filter_bank(fft_size, conv_len))
    xf = jnp.fft.fft(x, conv_len)
    corr = jnp.fft.ifft(xf[..., None, :] * bank, axis=-1)[..., :nvalid]
    p = jnp.abs(corr) ** 2
    if norm:
        e = jnp.cumsum(jnp.abs(x) ** 2, axis=-1)
        win = e[..., fft_size - 1 :] - jnp.concatenate(
            [jnp.zeros_like(e[..., :1]), e[..., : nvalid - 1]], axis=-1)
        p = p / jnp.maximum(win[..., None, :], 1e-12)
    return p


def pss_find_peak(x, fft_size: int):
    """Batched search: returns (n_id_2, offset, metric) per leading batch.

    offset is the sample index where the PSS symbol (without CP) starts.
    metric is the normalized correlation power in [0, 1].
    """
    import jax.numpy as jnp

    p = pss_find(x, fft_size)  # [..., 3, nvalid]
    flat = p.reshape(p.shape[:-2] + (-1,))
    am = jnp.argmax(flat, axis=-1)
    nvalid = p.shape[-1]
    n_id_2 = (am // nvalid).astype(jnp.int32)
    offset = (am % nvalid).astype(jnp.int32)
    metric = jnp.take_along_axis(flat, am[..., None], axis=-1)[..., 0]
    return n_id_2, offset, metric


def pss_cfo_compute(x_sym, n_id_2, fft_size: int):
    """CFO (in subcarrier-spacing units) from one received PSS symbol.

    Reference method (pss.c srsran_pss_cfo_compute): correlate each half of
    the received symbol with the replica half; CFO = angle(c0 * conj(c1))/pi
    ... with the sign such that positive CFO rotates the second half forward:
    cfo = carg(c1 * conj(c0)) / pi.  n_id_2 may be traced (selects replica by
    one-hot matmul over the 3-replica bank).
    """
    import jax
    import jax.numpy as jnp

    bank = jnp.asarray(np.stack([pss_time(n, fft_size) for n in range(3)]))
    oh = jax.nn.one_hot(n_id_2, 3, dtype=jnp.complex64)
    rep = jnp.einsum("...u,un->...n", oh, bank)
    half = fft_size // 2
    c0 = jnp.sum(x_sym[..., :half] * jnp.conj(rep[..., :half]), axis=-1)
    c1 = jnp.sum(x_sym[..., half:] * jnp.conj(rep[..., half:]), axis=-1)
    return jnp.angle(c1 * jnp.conj(c0)) / jnp.pi

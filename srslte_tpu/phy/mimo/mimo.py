"""Layer mapping, transmit diversity and equalization (36.211 §6.3.3-4).

Reference behavior: lib/src/phy/mimo/{layermap.c, precoding.c}.  Supported in
this round: single-port (TM1) passthrough with ZF/MMSE equalization, and
2-port SFBC transmit diversity (TM2 / PBCH / PDCCH) per 36.211 §6.3.4.3:

    port0: [ x0,  x1 ]      port1: [ -x1*, x0* ]   (pairs of subcarriers,
    with 1/sqrt(2) scaling at the transmitter)

Everything is elementwise over RE pairs -> pure VPU math, batched.
"""

from __future__ import annotations

import jax.numpy as jnp


def layermap_single(symbols):
    return symbols


def layerdemap_single(symbols):
    return symbols


def equalize_zf(y, h):
    """Zero-forcing 1x1: x = y / h (precoding.c srsran_predecoding_single)."""
    return y * jnp.conj(h) / jnp.maximum(jnp.abs(h) ** 2, 1e-12)


def equalize_mmse(y, h, noise_var):
    """MMSE 1x1: x = conj(h) y / (|h|^2 + sigma^2).

    noise_var broadcasts against y's batch dims (precoding.c:841+ semantics;
    output is the symbol estimate, consistent with unit-energy constellations).
    """
    return y * jnp.conj(h) / (jnp.abs(h) ** 2 + noise_var)


def alamouti_encode_2tx(x):
    """SFBC: x [..., n] (n even) -> per-port symbols [..., 2, n].

    36.211 §6.3.4.3 with the reference's pairing over adjacent REs
    (precoding.c srsran_precoding_diversity, 2 ports).
    """
    x0, x1 = x[..., 0::2], x[..., 1::2]
    p0 = jnp.stack([x0, x1], axis=-1).reshape(x.shape)
    p1 = jnp.stack([-jnp.conj(x1), jnp.conj(x0)], axis=-1).reshape(x.shape)
    return jnp.stack([p0, p1], axis=-2) / jnp.sqrt(2.0)


# ---------------------------------------------------------------- 2-layer SM
# 36.211 table 6.3.4.2.3-1: 2-port rank-2 codebook (precoding.c pmi tables)
import numpy as np

_W2 = np.stack([
    np.array([[1, 0], [0, 1]], np.complex64) / np.sqrt(2),          # identity
    np.array([[1, 1], [1, -1]], np.complex64) / 2,                  # pmi 1
    np.array([[1, 1], [1j, -1j]], np.complex64) / 2,                # pmi 2
])
# large-delay CDD (TM3): D(i) = diag(1, e^{-j*pi*i}), U = DFT2
_U2 = np.array([[1, 1], [1, np.exp(-1j * np.pi)]], np.complex64) / np.sqrt(2)


def precode_sm_2layer(x, pmi: int | None = None):
    """Spatial multiplexing, 2 layers -> 2 ports.

    x [..., 2, n]: layer symbols.  pmi None => TM3 large-delay CDD
    (precoding.c srsran_precoding_cdd); else TM4 codebook entry.
    Returns per-port symbols [..., 2, n].
    """
    if pmi is None:
        n = x.shape[-1]
        i = jnp.arange(n)
        d1 = jnp.exp(-1j * jnp.pi * i).astype(jnp.complex64)  # alternates ±1
        u = jnp.asarray(_U2)
        # s' = U x ; s'' = D s' ; y = W s'' with W = I/sqrt(2)
        sp = jnp.einsum("lk,...kn->...ln", u, x.astype(jnp.complex64))
        sp = sp * jnp.stack([jnp.ones_like(d1), d1])
        return sp / jnp.sqrt(2.0)
    w = jnp.asarray(_W2[pmi])
    return jnp.einsum("pl,...ln->...pn", w, x.astype(jnp.complex64))


def mmse_sm_2layer(y, h, noise_var, pmi: int | None = None):
    """2x2 MMSE detection: y [..., 2rx, n], h [..., 2rx, 2tx, n] -> x [..., 2, n].

    The effective channel folds in the precoder (CDD for TM3 / codebook for
    TM4); per-RE 2x2 inversion in closed form (precoding.c srsran_predecoding
    _type MMSE path).  Also returns per-layer post-MMSE gain for LLR scaling.
    """
    if pmi is None:
        n = y.shape[-1]
        i = jnp.arange(n)
        d1 = jnp.exp(-1j * jnp.pi * i).astype(jnp.complex64)
        u = jnp.asarray(_U2)
        dmat = jnp.stack([jnp.ones_like(d1), d1])  # [2, n]
        # heff[r, l, n] = sum_k h[r,k,n] * (W D U)[k,l,n], W = I/sqrt2
        wdu = (dmat[:, None, :] * u[:, :, None]) / jnp.sqrt(2.0)  # [k, l, n]
        heff = jnp.einsum("...rkn,kln->...rln", h.astype(jnp.complex64), wdu)
    else:
        w = jnp.asarray(_W2[pmi])
        heff = jnp.einsum("...rkn,kl->...rln", h.astype(jnp.complex64), w)
    return mmse_2x2(y, heff, noise_var)


def mmse_2x2(y, heff, noise_var):
    """Closed-form per-RE 2x2 MMSE on an EFFECTIVE channel.

    y [..., 2rx, n], heff [..., 2rx, 2layer, n] -> (x [..., 2, n],
    per-layer gain [..., 2, n]).  Shared by the LTE TM3/TM4 paths above and
    the NR 2-layer PDSCH (identity precoding, ports == layers).
    """
    # A = H^H H + nv I  (2x2), x = A^-1 H^H y
    hh = jnp.conj(jnp.swapaxes(heff, -3, -2))  # [..., l, r, n]
    a = jnp.einsum("...lrn,...rmn->...lmn", hh, heff)
    nv = jnp.mean(jnp.asarray(noise_var))  # scalar regularizer
    a00 = a[..., 0, 0, :] + nv
    a11 = a[..., 1, 1, :] + nv
    a01 = a[..., 0, 1, :]
    a10 = a[..., 1, 0, :]
    det = a00 * a11 - a01 * a10
    z = jnp.einsum("...lrn,...rn->...ln", hh, y.astype(jnp.complex64))
    x0 = (a11 * z[..., 0, :] - a01 * z[..., 1, :]) / det
    x1 = (-a10 * z[..., 0, :] + a00 * z[..., 1, :]) / det
    # post-MMSE effective gain per layer (for LLR weighting): diag(A^-1 A_sig)
    g0 = jnp.real(a00 - nv)
    g1 = jnp.real(a11 - nv)
    return jnp.stack([x0, x1], axis=-2), jnp.stack([g0, g1], axis=-2)


def alamouti_decode_2tx(y, h0, h1, noise_var=0.0):
    """SFBC combine: y [..., n], per-port channels h0/h1 [..., n] -> x [..., n].

    Standard Alamouti combining over RE pairs (precoding.c
    srsran_predecoding_diversity): for pair (y_a, y_b):
      x0 = (h0a* y_a + h1b y_b*) / (|h0|^2+|h1|^2) * sqrt(2)
      x1 = (h1a* y_a - h0b y_b*)... using per-RE channel of each pair member.
    The sqrt(2) undoes the TX scaling.
    """
    ya, yb = y[..., 0::2], y[..., 1::2]
    h0a, h0b = h0[..., 0::2], h0[..., 1::2]
    h1a, h1b = h1[..., 0::2], h1[..., 1::2]
    # y_a = (h0 x0 - h1 x1*)/sqrt2 ; y_b = (h0 x1 + h1 x0*)/sqrt2
    # => x0 = sqrt2 (h0a* y_a + h1b y_b*) / (|h0|^2+|h1|^2)
    #    x1 = sqrt2 (h0b* y_b - h1a y_a*) / (|h0|^2+|h1|^2)
    # (assumes h approx. constant over the pair, as does the reference)
    denom = (jnp.abs(h0a) ** 2 + jnp.abs(h1a) ** 2) / 2 \
        + (jnp.abs(h0b) ** 2 + jnp.abs(h1b) ** 2) / 2 + noise_var
    denom = jnp.maximum(denom, 1e-12)
    x0 = (jnp.conj(h0a) * ya + h1b * jnp.conj(yb)) / denom
    x1 = (jnp.conj(h0b) * yb - h1a * jnp.conj(ya)) / denom
    out = jnp.stack([x0, x1], axis=-1).reshape(y.shape)
    return out * jnp.sqrt(2.0)


# ----------------------------------------------------------- 4-port SM (TM3/4)
# 36.211 table 6.3.4.2.3-2: Householder codebook W_n = I - 2 u_n u_n^H / |u_n|^2.
# The reference stops at 2x2 spatial multiplexing (precoding.c pmi_select_1l/2l
# and srsran_precoding_cdd reject 4 ports); this extends to the full 4-port
# rank-1..4 codebook for peak-rate operation.
_SQ2 = np.sqrt(0.5)
_U4 = np.array([
    [1, -1, -1, -1],
    [1, -1j, 1, 1j],
    [1, 1, -1, 1],
    [1, 1j, 1, -1j],
    [1, (-1 - 1j) * _SQ2, -1j, (1 - 1j) * _SQ2],
    [1, (1 - 1j) * _SQ2, 1j, (-1 - 1j) * _SQ2],
    [1, (1 + 1j) * _SQ2, -1j, (-1 + 1j) * _SQ2],
    [1, (-1 + 1j) * _SQ2, 1j, (1 + 1j) * _SQ2],
    [1, -1, 1, 1],
    [1, -1j, -1, -1j],
    [1, 1, 1, -1],
    [1, 1j, -1, 1j],
    [1, -1, -1, 1],
    [1, -1, 1, -1],
    [1, 1, -1, -1],
    [1, 1, 1, 1],
], np.complex64)

_W4 = np.stack([np.eye(4, dtype=np.complex64)
                - 2.0 * np.outer(u, u.conj()) / np.vdot(u, u).real
                for u in _U4])

# per-rank column selections (1-indexed in the spec; 0-indexed here)
_CB4_COLS = {
    1: [[0]] * 16,
    2: [[0, 3], [0, 1], [0, 1], [0, 1], [0, 3], [0, 3], [0, 2], [0, 2],
        [0, 1], [0, 3], [0, 2], [0, 2], [0, 1], [0, 2], [0, 2], [0, 1]],
    3: [[0, 1, 3], [0, 1, 2], [0, 1, 2], [0, 1, 2], [0, 1, 3], [0, 1, 3],
        [0, 2, 3], [0, 2, 3], [0, 1, 3], [0, 2, 3], [0, 1, 2], [0, 2, 3],
        [0, 1, 2], [0, 1, 2], [0, 1, 2], [0, 1, 2]],
    4: [[0, 1, 2, 3], [0, 1, 2, 3], [2, 1, 0, 3], [2, 1, 0, 3],
        [0, 1, 2, 3], [0, 1, 2, 3], [0, 2, 1, 3], [0, 2, 1, 3],
        [0, 1, 2, 3], [0, 1, 2, 3], [0, 2, 1, 3], [0, 2, 1, 3],
        [0, 1, 2, 3], [0, 2, 1, 3], [2, 1, 0, 3], [0, 1, 2, 3]],
}


def codebook_4port(pmi: int, n_layers: int) -> np.ndarray:
    """[4 ports, n_layers] precoder, power-normalized per 36.211."""
    w = _W4[pmi][:, _CB4_COLS[n_layers][pmi]]
    return (w / np.sqrt(n_layers)).astype(np.complex64)


# TM3 large-delay CDD, 4 ports (36.211 §6.3.4.2.2): U fixed 4x4 DFT,
# D(i) = diag(e^{-j2pi*i*k/4}), W(i) cycles over codebook indices 12..15.
_DFT4 = np.exp(-2j * np.pi * np.outer(np.arange(4), np.arange(4)) / 4) / 2.0
_CDD4_W = np.stack([_W4[k][:, _CB4_COLS[4][k]] for k in (12, 13, 14, 15)])


def precode_sm_4port(x, pmi: int | None = None):
    """4-port spatial multiplexing: x [..., nl, n] layers -> [..., 4, n].

    pmi None = TM3 large-delay CDD (4 layers); else TM4 codebook entry for
    rank x.shape[-2].
    """
    nl = x.shape[-2]
    n = x.shape[-1]
    x = x.astype(jnp.complex64)
    if pmi is None:
        assert nl == 4, "4-port CDD runs rank 4"
        i = jnp.arange(n)
        d = jnp.exp(-2j * jnp.pi * i[None, :] * jnp.arange(4)[:, None] / 4)
        wc = jnp.asarray(_CDD4_W)[jnp.mod(i, 4)]  # [n, 4, 4]
        u = jnp.asarray(_DFT4.astype(np.complex64))
        # y(i) = W(i) D(i) U x(i); W carries the rank-4 1/2 normalization
        s = jnp.einsum("kl,...ln->...kn", u, x) * d
        return jnp.einsum("npk,...kn->...pn", wc, s) / 2.0
    w = jnp.asarray(codebook_4port(pmi, nl))
    return jnp.einsum("pl,...ln->...pn", w, x)


def mmse_sm_4port(y, h, noise_var, pmi: int | None = None, n_layers: int = 4):
    """MMSE detection for 4-port SM: y [..., nrx, n], h [..., nrx, 4, n].

    Folds the precoder into the channel and solves the nl x nl normal
    equations per RE (batched jnp.linalg.solve -> XLA batched LU).
    Returns (x [..., nl, n], gain [..., nl, n]).
    """
    n = y.shape[-1]
    h = h.astype(jnp.complex64)
    if pmi is None:
        assert n_layers == 4
        i = jnp.arange(n)
        d = jnp.exp(-2j * jnp.pi * i[None, :] * jnp.arange(4)[:, None] / 4)
        wc = jnp.asarray(_CDD4_W)[jnp.mod(i, 4)]  # [n, 4, 4]
        u = jnp.asarray(_DFT4.astype(np.complex64))
        # M(i) = W(i) D(i) U  (scaled as in precode_sm_4port)
        du = d.T[:, :, None] * u[None, :, :]  # [n, k, l]
        m = jnp.einsum("npk,nkl->npl", wc, du) / 2.0
        heff = jnp.einsum("...rpn,npl->...rln", h, m)
    else:
        w = jnp.asarray(codebook_4port(pmi, n_layers))
        heff = jnp.einsum("...rpn,pl->...rln", h, w)
    hh = jnp.conj(jnp.swapaxes(heff, -3, -2))  # [..., l, r, n]
    a = jnp.einsum("...lrn,...rmn->...lmn", hh, heff)
    nv = jnp.mean(jnp.asarray(noise_var))
    nl = heff.shape[-2]
    a = a + nv * jnp.eye(nl, dtype=a.dtype)[..., None]
    z = jnp.einsum("...lrn,...rn->...ln", hh, y.astype(jnp.complex64))
    # batched solve: move the RE axis into the batch
    am = jnp.moveaxis(a, -1, -3)  # [..., n, l, m]
    zm = jnp.moveaxis(z, -1, -2)[..., None]  # [..., n, l, 1]
    xm = jnp.linalg.solve(am, zm)[..., 0]  # [..., n, l]
    x = jnp.moveaxis(xm, -1, -2)
    gain = jnp.real(jnp.einsum("...lln->...ln", a)) - nv
    return x, gain


# ------------------------------------------------------------- 4-port SFBC-FSTD
def alamouti_encode_4tx(x):
    """SFBC-FSTD: x [..., n] -> per-port symbols [..., 4, n].

    36.211 §6.3.4.3 (4 antenna ports, precoding.c srsran_precoding_diversity
    nof_ports==4): quadruple (x0..x3) occupies 4 REs; ports (0,2) carry an
    Alamouti pair on the first two REs, ports (1,3) on the last two; the
    other ports transmit zero there (frequency-switched diversity).  A
    trailing n%4==2 remainder is sent as a plain 2-port pair on (0,2), as
    the reference does.
    """
    n = x.shape[-1]
    m = n - n % 4
    q = x[..., :m].reshape(x.shape[:-1] + (m // 4, 4))
    x0, x1, x2, x3 = (q[..., i] for i in range(4))
    zero = jnp.zeros_like(x0)
    c = jnp.conj
    p0 = jnp.stack([x0, x1, zero, zero], -1)
    p1 = jnp.stack([zero, zero, x2, x3], -1)
    p2 = jnp.stack([-c(x1), c(x0), zero, zero], -1)
    p3 = jnp.stack([zero, zero, -c(x3), c(x2)], -1)
    out = jnp.stack([p0, p1, p2, p3], -3)
    out = out.reshape(x.shape[:-1] + (4, m)) / jnp.sqrt(2.0)
    if n % 4:
        tail = alamouti_encode_2tx(x[..., m:])  # [..., 2, rem] on ports 0, 2
        zt = jnp.zeros_like(tail[..., 0, :])
        tail4 = jnp.stack([tail[..., 0, :], zt, tail[..., 1, :], zt], -2)
        out = jnp.concatenate([out, tail4], -1)
    return out


def alamouti_decode_4tx(y, h, noise_var=0.0):
    """SFBC-FSTD combine: y [..., n], h [..., 4 ports, n] -> (x, gain).

    Each RE pair is a standard Alamouti decode against the port pair that
    was active there ((0,2) then (1,3) alternating); gain is the per-RE
    diversity channel power for LLR weighting (predecoding_diversity).
    """
    n = y.shape[-1]
    m = n - n % 4
    yq = y[..., :m].reshape(y.shape[:-1] + (m // 4, 2, 2))
    hq = h[..., :m].reshape(h.shape[:-1] + (m // 4, 2, 2))
    # first RE pair uses ports (0, 2); second uses (1, 3)
    ya = yq[..., 0, :].reshape(y.shape[:-1] + (m // 2,))
    yb = yq[..., 1, :].reshape(y.shape[:-1] + (m // 2,))
    ha0 = hq[..., 0, :, 0, :].reshape(ya.shape)
    ha2 = hq[..., 2, :, 0, :].reshape(ya.shape)
    hb1 = hq[..., 1, :, 1, :].reshape(ya.shape)
    hb3 = hq[..., 3, :, 1, :].reshape(ya.shape)
    xa = alamouti_decode_2tx(ya, ha0, ha2, noise_var)
    xb = alamouti_decode_2tx(yb, hb1, hb3, noise_var)
    ga = (jnp.abs(ha0) ** 2 + jnp.abs(ha2) ** 2) / 2
    gb = (jnp.abs(hb1) ** 2 + jnp.abs(hb3) ** 2) / 2
    xq = jnp.stack([xa.reshape(ya.shape[:-1] + (m // 4, 2)),
                    xb.reshape(ya.shape[:-1] + (m // 4, 2))], -2)
    gq = jnp.stack([jnp.repeat(ga.reshape(ya.shape[:-1] + (m // 4, 2))
                               .mean(-1, keepdims=True), 2, -1),
                    jnp.repeat(gb.reshape(ya.shape[:-1] + (m // 4, 2))
                               .mean(-1, keepdims=True), 2, -1)], -2)
    x = xq.reshape(y.shape[:-1] + (m,))
    g = gq.reshape(y.shape[:-1] + (m,))
    if n % 4:
        xt = alamouti_decode_2tx(y[..., m:], h[..., 0, m:], h[..., 2, m:],
                                 noise_var)
        gt = (jnp.abs(h[..., 0, m:]) ** 2 + jnp.abs(h[..., 2, m:]) ** 2) / 2
        x = jnp.concatenate([x, xt], -1)
        g = jnp.concatenate([g, gt], -1)
    return x, g

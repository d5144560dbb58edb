"""NR Polar code: construction, encoder, rate matching, SC decoder
(38.212 §5.3.1/§5.4.1).

Reference behavior: lib/src/phy/fec/polar/{polar_code.c, polar_encoder.c,
polar_rm.c, polar_decoder*.c}.  The universal reliability sequence Q^1024
(38.212 table 5.3.1.2-1) ships as polar_q1024.npy (see
tools/extract_polar_seq.py); per-N mother codes are its subsequences.

TPU-first: the encoder is log2(N) vectorized butterfly XOR stages; the SC
decoder is the recursive f/g formulation vectorized over the batch with the
tree unrolled at trace time (static N).  Parity-check bits (UL nPC>0) and
list decoding are not yet implemented — SC + outer CRC matches the
reference's DL usage envelope for blind-decode candidates.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np

_QPATH = os.path.join(os.path.dirname(__file__), "polar_q1024.npy")
_ILPATH = os.path.join(os.path.dirname(__file__), "polar_il_pattern.npy")
K_MAX_IL = 164

# 38.212 table 5.4.1.1-1 sub-block interleaver pattern
_P32 = np.array([0, 1, 2, 4, 3, 5, 6, 7, 8, 16, 9, 17, 10, 18, 11, 19,
                 12, 20, 13, 21, 14, 22, 15, 23, 24, 25, 26, 28, 27, 29,
                 30, 31], np.int64)


@functools.lru_cache(maxsize=1)
def q1024() -> np.ndarray:
    return np.load(_QPATH).astype(np.int64)


@functools.lru_cache(maxsize=None)
def input_interleaver(k: int) -> np.ndarray:
    """38.212 §5.3.1.1 input interleaver for I_IL=1: out[i] = in[perm[i]].

    The 164-entry pattern (table 5.3.1.1-1, polar_il_pattern.npy) filtered
    to entries >= K_MAX - K, offset down (polar_interleaver.c:38).
    """
    pat = np.load(_ILPATH)
    sel = pat[pat >= K_MAX_IL - k] - (K_MAX_IL - k)
    assert len(sel) == k
    return sel.astype(np.int64)


@functools.lru_cache(maxsize=None)
def mother_code(n: int) -> np.ndarray:
    """Reliability order for N=2^n (subsequence rule, §5.3.1.2)."""
    q = q1024()
    return q[q < (1 << n)]


@functools.lru_cache(maxsize=None)
def blk_interleaver(n: int) -> np.ndarray:
    """J(i) sub-block interleaver for N=2^n (§5.4.1.1)."""
    nn = 1 << n
    i = np.arange(nn)
    b = _P32[32 * i // nn]
    return (b * (nn // 32) + i % (nn // 32)).astype(np.int64)


@dataclass(frozen=True)
class PolarCode:
    """Code construction for one (K, E) bucket.

    `with_pc=True` enables the UL parity-check bits (38.212 §5.3.1.2,
    polar_code.c get_code_params:124): nPC=3 when 18 <= K <= 25, with one
    minimum-row-weight PC bit (position 252/248 of the N=256 mother code)
    when E > K + 189.
    """

    K: int
    E: int
    n_max: int = 9  # 9 for DL, 10 for UL
    with_pc: bool = False

    @functools.cached_property
    def n(self) -> int:
        e, k = self.E, self.K
        cl = int(np.ceil(np.log2(e)))
        if e <= (9 * (1 << (cl - 1))) // 8 and k / e < 9 / 16:
            n1 = cl - 1
        else:
            n1 = cl
        n2 = int(np.ceil(np.log2(8 * k)))
        return max(min(n1, n2, self.n_max), 5)

    @property
    def N(self) -> int:
        return 1 << self.n

    @property
    def n_pc(self) -> int:
        return 3 if (self.with_pc and 18 <= self.K <= 25) else 0

    @property
    def n_wm_pc(self) -> int:
        return 1 if (self.n_pc and self.E > self.K + 189) else 0

    @functools.cached_property
    def _construction(self) -> tuple[np.ndarray, np.ndarray]:
        """(k_set_full sorted [K + nPC], pc_set sorted [nPC])."""
        nn, k, e = self.N, self.K, self.E
        frozen = np.zeros(nn, bool)
        jn = blk_interleaver(self.n)
        if e < nn:
            if 16 * k <= 7 * e:  # puncturing: first N-E interleaved + low idx
                frozen[jn[: nn - e]] = True
                if e >= 3 * nn // 4:
                    t = int(np.ceil(3 * nn / 4 - e / 2)) - 1
                else:
                    t = int(np.ceil(9 * nn / 16 - e / 4)) - 1
                frozen[: t + 1] = True
            else:  # shortening: last N-E interleaved positions
                frozen[jn[e:]] = True
        # most reliable K + nPC non-prefrozen positions carry data + PC
        order = mother_code(self.n)
        free = order[~frozen[order]]
        sel = free[-(k + self.n_pc):]
        pc = []
        if self.n_pc:
            # the (nPC - nWmPC) least reliable of the selection...
            pc = list(sel[: self.n_pc - self.n_wm_pc])
            if self.n_wm_pc:
                # ...plus the minimum-row-weight pick (polar_code.c:278-283)
                pc.append(252 if k <= 21 else 248)
        return (np.sort(sel).astype(np.int64),
                np.sort(np.array(pc, np.int64)))

    @functools.cached_property
    def frozen_mask(self) -> np.ndarray:
        """[N] bool: True = frozen (§5.3.1.2 incl. rate-matching pre-freeze)."""
        mask = np.ones(self.N, bool)
        mask[self._construction[0]] = False
        return mask

    @functools.cached_property
    def k_set(self) -> np.ndarray:
        """Information positions only (PC positions excluded), sorted."""
        full, pc = self._construction
        if not self.n_pc:
            return full
        return np.setdiff1d(full, pc)

    @functools.cached_property
    def pc_set(self) -> np.ndarray:
        return self._construction[1]

    @functools.cached_property
    def pc_matrix(self) -> np.ndarray:
        """[nPC, K] GF(2): PC value p = XOR of info bits q < p with
        q ≡ p (mod 5) — the 5-slot rotating register of chanalloc
        (polar_chanalloc.c:51-80) is linear in the message."""
        m = np.zeros((self.n_pc, self.K), np.uint8)
        for r, p in enumerate(self.pc_set):
            for c, q in enumerate(self.k_set):
                if q < p and (p - q) % 5 == 0:
                    m[r, c] = 1
        return m

    @functools.cached_property
    def leaf_kind(self) -> np.ndarray:
        """[N] int8: 0 = frozen, 1 = info, 2 = parity-check."""
        kind = np.zeros(self.N, np.int8)
        kind[self.k_set] = 1
        kind[self.pc_set] = 2
        return kind


def polar_transform(u):
    """Butterfly u -> u * G_N over GF(2): log2(N) vectorized stages."""
    import jax.numpy as jnp

    x = u.astype(jnp.uint8)
    n = x.shape[-1]
    s = 1
    while s < n:
        x = x.reshape(x.shape[:-1] + (n // (2 * s), 2, s))
        x = jnp.concatenate([x[..., 0, :] ^ x[..., 1, :], x[..., 1, :]],
                            axis=-1)
        x = x.reshape(x.shape[:-2] + (n,))
        s *= 2
    return x


def polar_encode(bits, code: PolarCode):
    """bits [..., K] -> rate-matched codeword bits [..., E] (jittable)."""
    import jax.numpy as jnp

    u = jnp.zeros(bits.shape[:-1] + (code.N,), jnp.uint8)
    u = u.at[..., jnp.asarray(code.k_set)].set(bits.astype(jnp.uint8))
    if code.n_pc:
        pc = jnp.matmul(bits.astype(jnp.uint8),
                        jnp.asarray(code.pc_matrix.T),
                        preferred_element_type=jnp.int32) & 1
        u = u.at[..., jnp.asarray(code.pc_set)].set(pc.astype(jnp.uint8))
    x = polar_transform(u)
    y = x[..., jnp.asarray(blk_interleaver(code.n))]
    nn, e = code.N, code.E
    if e >= nn:  # repetition
        reps = -(-e // nn)
        return jnp.tile(y, (1,) * (y.ndim - 1) + (reps,))[..., :e]
    if 16 * code.K <= 7 * e:  # puncturing: drop the first N-E
        return y[..., nn - e :]
    return y[..., :e]  # shortening


def polar_rm_rx(e_llr, code: PolarCode, shortened_val: float = -1e4):
    """LLRs [..., E] -> mother-code LLRs [..., N] (positive => bit 1)."""
    import jax.numpy as jnp

    nn, e = code.N, code.E
    y = jnp.zeros(e_llr.shape[:-1] + (nn,), e_llr.dtype)
    if e >= nn:
        for r in range(-(-e // nn)):
            chunk = e_llr[..., r * nn : (r + 1) * nn]
            y = y.at[..., : chunk.shape[-1]].add(chunk)
    elif 16 * code.K <= 7 * e:
        y = y.at[..., nn - e :].set(e_llr)  # punctured front: LLR 0
    else:
        y = y.at[..., :e].set(e_llr)
        y = y.at[..., e:].set(shortened_val)  # shortened tail: known 0
    return _deinterleave(y, code)


def _deinterleave(y, code: PolarCode):
    import jax.numpy as jnp

    jn = blk_interleaver(code.n)
    out = jnp.zeros_like(y)
    return out.at[..., jnp.asarray(jn)].set(y)


def polar_decode_list(llr, code: PolarCode, L: int = 8):
    """Batched CRC-aided-ready SCL decode: llr [E] -> candidates [L, K].

    Reference behavior: lib/src/phy/fec/polar/polar_decoder_ssc_*.c list
    variants.  TPU-first design: the list dimension is a leading batch axis;
    the SC tree is unrolled at trace time (static N) and every node is an
    [L, width] elementwise op.  Path forking at information leaves is a
    top-L selection over 2L path metrics; the surviving-path permutation is
    *threaded back* through the recursion (each node re-gathers its local
    arrays with the child's permutation) instead of copying decoder state,
    so there is no pointer-chasing LLR memory as in the C implementation —
    just gathers along the path axis that XLA fuses.

    Returns candidates ordered by path metric (best first); callers check
    the outer CRC per candidate (CA-SCL selection).
    """
    import jax
    import jax.numpy as jnp

    ln = polar_rm_rx(llr, code)
    l0 = -ln.astype(jnp.float32)  # positive => bit 0 internally
    kind = code.leaf_kind  # 0 frozen / 1 info / 2 parity-check
    # dead paths start at +inf metric so they lose every selection until
    # enough forks have populated the list
    m0 = jnp.where(jnp.arange(L) == 0, 0.0, jnp.inf).astype(jnp.float32)
    # 5-slot PC shift register per path (38.212 §5.3.1.2; rotates at every
    # leaf, folds info bits in, emits at PC leaves)
    reg0 = jnp.zeros((L, 5), jnp.uint8)

    def dec(l, knd, m, reg):
        """l [L, n], m [L], reg [L, 5] -> (u, x, m', perm, reg')."""
        n = l.shape[-1]
        if n == 1:
            lf = l[..., 0]
            if code.n_pc:
                reg = jnp.roll(reg, -1, axis=-1)
            if knd[0] == 0:  # frozen
                b = jnp.zeros((L, 1), jnp.uint8)
                return b, b, m + jax.nn.relu(-lf), jnp.arange(L), reg
            if knd[0] == 2:  # parity check: bit forced to register output
                b = reg[:, 0]
                pen = jax.nn.relu(lf * (2.0 * b.astype(jnp.float32) - 1.0))
                return b[:, None], b[:, None], m + pen, jnp.arange(L), reg
            pen0 = m + jax.nn.relu(-lf)
            pen1 = m + jax.nn.relu(lf)
            both = jnp.concatenate([pen0, pen1])  # [2L]
            _, idx = jax.lax.top_k(-both, L)
            b = (idx >= L).astype(jnp.uint8)
            if code.n_pc:
                reg = reg[idx % L]
                reg = reg.at[:, 0].set(reg[:, 0] ^ b)
            return b[:, None], b[:, None], both[idx], idx % L, reg
        half = n // 2
        la, lb = l[..., :half], l[..., half:]
        f = (jnp.sign(la) * jnp.sign(lb)
             * jnp.minimum(jnp.abs(la), jnp.abs(lb)))
        u1, x1, m, p1, reg = dec(f, knd[:half], m, reg)
        la, lb = la[p1], lb[p1]
        g = lb + (1.0 - 2.0 * x1.astype(jnp.float32)) * la
        u2, x2, m, p2, reg = dec(g, knd[half:], m, reg)
        u1, x1 = u1[p2], x1[p2]
        return (jnp.concatenate([u1, u2], -1),
                jnp.concatenate([x1 ^ x2, x2], -1), m, p1[p2], reg)

    u_hat, _, metric, _, _ = dec(jnp.broadcast_to(l0, (L,) + l0.shape),
                                 kind, m0, reg0)
    order = jnp.argsort(metric)
    return u_hat[order][:, jnp.asarray(code.k_set)]


def polar_decode(llr, code: PolarCode):
    """Batched SC decode: llr [..., E] (positive => bit 1) -> bits [..., K].

    PC-bit codes route through the list decoder at L=1 (the PC register
    needs sequential leaf state the plain recursion does not carry).
    """
    import jax.numpy as jnp

    if code.n_pc:
        return polar_decode_list(llr, code, L=1)[0]
    ln = polar_rm_rx(llr, code)
    # classic convention internally: positive => bit 0
    l0 = -ln.astype(jnp.float32)
    frozen = code.frozen_mask

    def dec(l, fro):
        """l [..., n]; fro: numpy bool [n]. Returns (u_hat bits, x_hat)."""
        n = l.shape[-1]
        if n == 1:
            if fro[0]:
                b = jnp.zeros(l.shape, jnp.uint8)
            else:
                b = (l < 0).astype(jnp.uint8)
            return b, b
        half = n // 2
        la, lb = l[..., :half], l[..., half:]
        f = (jnp.sign(la) * jnp.sign(lb)
             * jnp.minimum(jnp.abs(la), jnp.abs(lb)))
        u1, x1 = dec(f, fro[:half])
        g = lb + (1.0 - 2.0 * x1.astype(jnp.float32)) * la
        u2, x2 = dec(g, fro[half:])
        return jnp.concatenate([u1, u2], -1), jnp.concatenate([x1 ^ x2, x2], -1)

    u_hat, _ = dec(l0, frozen)
    return u_hat[..., jnp.asarray(code.k_set)]

"""NR LDPC: BG1/BG2 encoder, layered min-sum decoder, rate matching
(38.212 §5.3.2/§5.4.2).

Reference behavior: lib/src/phy/fec/ldpc/{ldpc_encoder.c, ldpc_decoder.c,
ldpc_rm.c, base_graph.c} — base-graph tables are the 3GPP spec constants
(shipped as ldpc_bg.npz, extracted by tools/extract_ldpc_tables.py).

TPU-first design:
- The encoder computes core parities via the standard double-diagonal
  back-substitution (each QC block is x^shift in GF(2)[x]/(x^Zc-1); the sum
  of the 4 core rows collapses to a single monomial, asserted at table-load
  time), then extension parities by accumulation — all as batched rolls and
  XORs over [B, n_blocks, Zc] uint8 tensors.
- The decoder is layered normalized min-sum with STATIC per-row edge tables:
  every layer update is one gather -> min/sign reduction -> scatter over
  [B, deg, Zc], unrolled over the 46/42 base rows; no dynamic control flow.
- Rate matching is a precomputed gather (TX) / scatter-add (RX) like the
  turbo rate matcher, with rv-dependent k0 and filler-bit skipping.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np

VOID = 0xFFFF
_LS_A = (2, 3, 5, 7, 9, 11, 13, 15)

_NPZ = os.path.join(os.path.dirname(__file__), "ldpc_bg.npz")


@functools.lru_cache(maxsize=1)
def _tables():
    z = np.load(_NPZ)
    return {1: z["bg1"].astype(np.int64), 2: z["bg2"].astype(np.int64)}


def lifting_index(zc: int) -> int:
    """Lifting-size set index i_LS (38.212 table 5.3.2-1)."""
    a = zc
    while a % 2 == 0 and a > 15:
        a //= 2
    for i, base in enumerate(_LS_A):
        x = base
        while x <= 384:
            if x == zc:
                return i
            x *= 2
    raise ValueError(f"invalid lifting size {zc}")


def valid_lifting_sizes() -> list:
    out = set()
    for a in _LS_A:
        x = a
        while x <= 384:
            out.add(x)
            x *= 2
    return sorted(out)


@dataclass(frozen=True)
class LdpcGraph:
    """Static structure for one (bg, Zc) bucket."""

    bg: int
    zc: int

    @property
    def n_sys_blocks(self) -> int:
        return 22 if self.bg == 1 else 10

    @property
    def m_blocks(self) -> int:
        return 46 if self.bg == 1 else 42

    @property
    def n_blocks(self) -> int:
        return self.n_sys_blocks + self.m_blocks

    @property
    def k(self) -> int:
        return self.n_sys_blocks * self.zc

    @property
    def n_full(self) -> int:
        return self.n_blocks * self.zc

    @functools.cached_property
    def shifts(self) -> np.ndarray:
        """[m_blocks, n_blocks] shift mod Zc, -1 where no edge."""
        t = _tables()[self.bg][lifting_index(self.zc)]
        s = np.where(t == VOID, -1, t % self.zc)
        return s.astype(np.int64)

    @functools.cached_property
    def rows(self) -> tuple:
        """Per base row: (cols [deg], shifts [deg])."""
        out = []
        for r in range(self.m_blocks):
            cols = np.where(self.shifts[r] >= 0)[0]
            out.append((cols.astype(np.int64), self.shifts[r][cols]))
        return tuple(out)

    @functools.cached_property
    def p1_inverse_shift(self) -> int:
        """Solve the core: sum of the 4 core rows' p1-column monomials must
        collapse to a single x^s (the 38.212 design property)."""
        kb = self.n_sys_blocks
        poly = np.zeros(self.zc, np.int64)
        for r in range(4):
            s = self.shifts[r, kb]
            if s >= 0:
                poly[s] ^= 1
        nz = np.where(poly)[0]
        assert len(nz) == 1, "core p1 column must sum to one monomial"
        return int(nz[0])


def _roll(x, shift: int):
    """QC rotation: out[k] = x[(k + shift) mod Zc] on the last axis."""
    import jax.numpy as jnp

    return jnp.roll(x, -shift, axis=-1)


def ldpc_encode(bits, graph: LdpcGraph):
    """bits [..., K] {0,1} -> full codeword [..., n_full] uint8 (jittable).

    Filler handling is the caller's job (set filler bits to 0).  The
    transmitted part is codeword[..., 2*Zc:] (first 2 blocks punctured).
    """
    import jax.numpy as jnp

    zc, kb = graph.zc, graph.n_sys_blocks
    s = bits.reshape(bits.shape[:-1] + (kb, zc)).astype(jnp.uint8)

    # lambda_i over systematic columns for ALL rows
    lam = []
    for r in range(graph.m_blocks):
        cols, shs = graph.rows[r]
        acc = None
        for c, sh in zip(cols, shs):
            if c >= kb:
                continue
            t = _roll(s[..., c, :], int(sh))
            acc = t if acc is None else acc ^ t
        lam.append(acc if acc is not None
                   else jnp.zeros(s.shape[:-2] + (zc,), jnp.uint8))

    # core parities p1..p4 (double-diagonal back-substitution)
    sum_core = lam[0] ^ lam[1] ^ lam[2] ^ lam[3]
    p = [None] * 4
    p[0] = _roll(sum_core, -graph.p1_inverse_shift)  # rot^{-1}
    solved = {kb: p[0]}
    for r in range(3):  # rows 0..2 each introduce one new parity col
        cols, shs = graph.rows[r]
        acc = lam[r]
        unknown = None
        for c, sh in zip(cols, shs):
            if c < kb:
                continue
            if c in solved:
                acc = acc ^ _roll(solved[c], int(sh))
            else:
                assert unknown is None
                unknown = (c, int(sh))
        c, sh = unknown
        solved[c] = _roll(acc, -sh)
    for i in range(4):
        p[i] = solved[kb + i]

    # extension parities: row r >= 4 has identity on col kb+r
    ext = []
    core = {kb + i: p[i] for i in range(4)}
    for r in range(4, graph.m_blocks):
        cols, shs = graph.rows[r]
        acc = lam[r]
        for c, sh in zip(cols, shs):
            if kb <= c < kb + 4:
                acc = acc ^ _roll(core[c], int(sh))
        ext.append(acc)

    blocks = ([s[..., i, :] for i in range(kb)] + p + ext)
    return jnp.concatenate(blocks, axis=-1).astype(jnp.uint8)


def ldpc_check(cw, graph: LdpcGraph):
    """Parity check: True where H*c == 0 (jittable)."""
    import jax.numpy as jnp

    zc = graph.zc
    c = cw.reshape(cw.shape[:-1] + (graph.n_blocks, zc))
    ok = jnp.ones(cw.shape[:-1], bool)
    for r in range(graph.m_blocks):
        cols, shs = graph.rows[r]
        acc = None
        for col, sh in zip(cols, shs):
            t = _roll(c[..., col, :], int(sh))
            acc = t if acc is None else acc ^ t
        ok = ok & jnp.all(acc == 0, axis=-1)
    return ok


MINSUM_SCALE = 0.75


def ldpc_decode(llr, graph: LdpcGraph, n_iter: int = 8):
    """Layered normalized min-sum. llr [..., n_full] (positive => bit 1).

    Punctured/shortened positions carry 0 LLR; filler positions should carry
    a large NEGATIVE LLR (known 0 bits).  Returns (hard [..., K] uint8,
    ok [...] parity check).

    The 46/42 base-row updates are statically unrolled (static gathers);
    the ITERATION loop is a fori_loop so the compiled graph stays one
    iteration deep (Python-unrolling iterations made XLA compile time
    explode at large Zc).
    """
    import jax
    import jax.numpy as jnp

    zc = graph.zc
    batch = llr.shape[:-1]
    # decoder convention: positive => bit 0 (classic min-sum); flip in/out
    v0 = (-llr).reshape(batch + (graph.n_blocks, zc)).astype(jnp.float32)
    max_deg = max(len(graph.rows[r][0]) for r in range(graph.m_blocks))
    msgs0 = jnp.zeros(batch + (graph.m_blocks, max_deg, zc), jnp.float32)

    def one_iteration(_, carry):
        v, msgs = carry
        for r in range(graph.m_blocks):
            cols, shs = graph.rows[r]
            deg = len(cols)
            t = jnp.stack([_roll(v[..., int(c), :], int(sh))
                           for c, sh in zip(cols, shs)], axis=-2)
            t = t - msgs[..., r, :deg, :]
            sgn = jnp.prod(jnp.sign(t) + (t == 0), axis=-2, keepdims=True)
            a = jnp.abs(t)
            m1 = jnp.min(a, axis=-2, keepdims=True)
            big = jnp.where(a == jnp.broadcast_to(m1, a.shape), jnp.inf, a)
            m2 = jnp.min(big, axis=-2, keepdims=True)
            mins = jnp.where(a == jnp.broadcast_to(m1, a.shape), m2, m1)
            s_excl = sgn * (jnp.sign(t) + (t == 0))  # product of others
            new = MINSUM_SCALE * s_excl * mins
            t = t + new
            msgs = msgs.at[..., r, :deg, :].set(new)
            for i, (c, sh) in enumerate(zip(cols, shs)):
                v = v.at[..., int(c), :].set(_roll(t[..., i, :], -int(sh)))
        return v, msgs

    v, _ = jax.lax.fori_loop(0, n_iter, one_iteration, (v0, msgs0))
    hard = (v.reshape(batch + (graph.n_full,)) < 0).astype(jnp.uint8)
    ok = ldpc_check(hard, graph)
    return hard[..., : graph.k], ok


# ------------------------------------------------------------ rate matching
def rm_k0(graph: LdpcGraph, rv: int, n_cb: int | None = None) -> int:
    """38.212 table 5.4.2.1-2 starting positions."""
    zc = graph.zc
    ncb = n_cb if n_cb is not None else graph.n_full - 2 * zc
    if graph.bg == 1:
        num, den = {0: 0, 1: 17, 2: 33, 3: 56}[rv], 66
    else:
        num, den = {0: 0, 1: 13, 2: 25, 3: 43}[rv], 50
    return (num * ncb // (den * zc)) * zc


@functools.lru_cache(maxsize=None)
def ldpc_rm_indices(graph: LdpcGraph, e: int, rv: int, qm: int,
                    k_prime: int) -> np.ndarray:
    """Gather table [E] into the full codeword [n_full].

    k_prime: number of non-filler systematic bits (fillers occupy
    [k_prime, K) and are skipped by the circular buffer).
    """
    zc = graph.zc
    # circular buffer = codeword minus the first 2 punctured blocks
    buf = np.arange(2 * zc, graph.n_full)
    filler = (buf >= k_prime) & (buf < graph.k)
    k0 = rm_k0(graph, rv)
    order = np.roll(buf, -k0)
    valid = order[~np.roll(filler, -k0)]
    reps = -(-e // len(valid))
    sel = np.tile(valid, reps)[:e]
    # bit interleaver (38.212 §5.4.2.2): write row-wise [E/Qm, Qm], read
    # column-wise... spec: e_interleaved[i + j*Qm] = e[i*(E/Qm) + j]
    rows = e // qm
    j, i = np.meshgrid(np.arange(rows), np.arange(qm), indexing="ij")
    perm = (i * rows + j).reshape(-1)
    return sel[perm].astype(np.int32)


def ldpc_rm_tx(cw, graph: LdpcGraph, e: int, rv: int, qm: int, k_prime: int):
    import jax.numpy as jnp

    idx = jnp.asarray(ldpc_rm_indices(graph, e, rv, qm, k_prime))
    return cw[..., idx]


def ldpc_rm_rx(e_llr, graph: LdpcGraph, rv: int, qm: int, k_prime: int,
               fill_val: float = -1e4):
    """Soft-combine into full-codeword LLRs (fillers get known-0 prior)."""
    import jax.numpy as jnp

    e = e_llr.shape[-1]
    idx = jnp.asarray(ldpc_rm_indices(graph, e, rv, qm, k_prime))
    out = jnp.zeros(e_llr.shape[:-1] + (graph.n_full,), e_llr.dtype)
    out = out.at[..., idx].add(e_llr)
    fill = jnp.zeros((graph.n_full,), e_llr.dtype)
    if k_prime < graph.k:
        fill = fill.at[k_prime : graph.k].set(fill_val)
    return out + fill

"""Pallas TPU kernel: windowed max-log-MAP SISO, VMEM-resident.

The XLA scan version (fec/tdec.py _siso_windowed) spills the per-step alpha
metrics [LT, 8, N] to HBM between the forward and backward passes — at large
batch that traffic dominates.  This kernel keeps both metric histories for a
tile of windows in VMEM scratch: HBM traffic is the window inputs once in
and the LLRs once out.

Kernel idioms (why it is shaped this way):
- ONE merged sequential loop runs the alpha recursion forward (t = 0..T+L-1)
  and the beta recursion backward (t = LT-1..T) in the same step — double
  the independent work per step, half the sequential depth of two passes.
- The 8-state trellis "gather" (predecessor/successor selection) is a pair
  of [8,8] x [8,TILE] MATMULS with 0/1 permutation matrices built from iota:
  full-width MXU work instead of single-sublane row shuffles, and no
  trace-time constants captured (Pallas forbids captured arrays).
- Branch gammas use 0/1 sublane masks, also built from iota via the closed
  trellis identities (verified in _check_identities against
  turbo.trellis_tables):
    alpha, into s' dropping bit b: pred = ((s'&3)<<1)|b,
      u = bit2^bit0(s') ^ b, parity = bit2^bit1(s') ^ b
    beta, from s with input u=0: next n0 = (s>>1)|((bit0^bit1)(s)<<2),
      parity p0 = (bit1^bit2)(s); u=1: n1 = n0^4, p1 = p0^1.
- LLRs are emitted inside the SAME loop, predicated: position t is finished
  by whichever recursion visits it second (alpha for t past the midpoint,
  beta before it), reading the other side's stored history.

Window layout (one unified halo window per output window):
  positions wL-T .. wL+L+T-1 (length LT = L+2T); alpha has an exact state-0
  init for window 0 and training halos elsewhere; beta an exact tail init
  for the last window; inactive (out-of-block) positions carry metrics
  through unchanged (live masks from iota).  K need not divide L — the tail
  of the last window is simply inactive, so L=128 fits every 36.212 K.

Trellis: LTE PCCC RSC, g0 = 1+D^2+D^3 (feedback), g1 = 1+D+D^3, 8 states.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..phy.fec.tdec import NEG, _tail_beta, _trellis_unrolled

TILE = 512  # window lanes per program


@functools.lru_cache(maxsize=1)
def _check_identities():
    """Assert the closed-form trellis identities against the tables."""
    from ..phy.fec.turbo import trellis_tables

    nxt, par, *_ = trellis_tables()
    for sp in range(8):
        for b in (0, 1):
            s = ((sp & 3) << 1) | b
            u = ((sp >> 2) ^ sp ^ b) & 1
            p = ((sp >> 2) ^ (sp >> 1) ^ b) & 1
            assert nxt[u, s] == sp and par[u, s] == p
    for s in range(8):
        n0 = (s >> 1) | (((s ^ (s >> 1)) & 1) << 2)
        p0 = ((s >> 1) ^ (s >> 2)) & 1
        assert nxt[0, s] == n0 and par[0, s] == p0
        assert nxt[1, s] == (n0 ^ 4) and par[1, s] == (p0 ^ 1)
    return True


def _siso_kernel(L: int, T: int, K: int, W: int):
    _check_identities()
    LT = L + 2 * T
    S = T + L  # merged loop steps
    f32 = jnp.float32

    def kernel(sa_ref, pr_ref, b0_ref, llr_ref, a_scr, b_scr):
        # ---- static tensors from iota (nothing captured) --------------------
        row = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
        pa = (col == ((row & 3) * 2)).astype(f32)  # alpha pred, b=0
        pb = (col == ((row & 3) * 2 + 1)).astype(f32)  # alpha pred, b=1
        n0r = (row >> 1) | (((row ^ (row >> 1)) & 1) << 2)
        pn0 = (col == n0r).astype(f32)  # beta succ, u=0
        pn1 = (col == (n0r ^ 4)).astype(f32)  # beta succ, u=1
        st = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
        u_a = (((st >> 2) ^ st) & 1).astype(f32)  # alpha: input bit, b=0
        q_a = (((st >> 2) ^ (st >> 1)) & 1).astype(f32)  # alpha: parity, b=0
        u_b, q_b = 1.0 - u_a, 1.0 - q_a  # b=1 flips both
        p0 = q_a  # beta: parity of u=0 branch == (bit1^bit2)(s)
        p1 = 1.0 - p0

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1)
        w_of_lane = (pl.program_id(0) * TILE + lane) % W

        def live_at(t):
            pos = w_of_lane * L + (t - T)
            return jnp.logical_and(pos >= 0, pos < K)

        preds, succs = _trellis_unrolled()

        def alpha_branches(a, sa, pr):
            g = (None, pr[0], sa[0], sa[0] + pr[0])
            ra, rb = [], []
            for sp in range(8):
                (sA, uA, pA), (sB, uB, pB) = preds[sp]
                ga, gb = g[(uA << 1) | pA], g[(uB << 1) | pB]
                ra.append(a[sA] if ga is None else a[sA] + ga)
                rb.append(a[sB] if gb is None else a[sB] + gb)
            return jnp.stack(ra), jnp.stack(rb)

        def beta_branches(b, sa, pr):
            g = (None, pr[0], sa[0], sa[0] + pr[0])
            r0, r1 = [], []
            for s in range(8):
                (n0, p0_), (n1, p1_) = succs[s]
                g0, g1 = g[p0_], g[2 | p1_]
                r0.append(b[n0] if g0 is None else b[n0] + g0)
                r1.append(b[n1] + g1)
            return jnp.stack(r0), jnp.stack(r1)

        half = (LT - 1) // 2 + 1  # first i with t_a=i visited after beta

        def step(i, carry):
            a, b = carry
            t_a = i
            t_b = LT - 1 - i
            sa_a = sa_ref[t_a][None]
            pr_a = pr_ref[t_a][None]
            sa_b = sa_ref[t_b][None]
            pr_b = pr_ref[t_b][None]

            # ---- alpha at t_a (history only read by beta-side LLR, t < half;
            # with the fully-unrolled loop this predicate is trace-time) ----
            @pl.when(t_a < half)
            def _():
                a_scr[t_a] = a
            ra, rb = alpha_branches(a, sa_a, pr_a)
            a_new = jnp.where(live_at(t_a), jnp.maximum(ra, rb), a)

            # alpha-side LLR for t_a in [half, T+L): beta history is complete
            @pl.when(jnp.logical_and(t_a >= half, t_a >= T))
            def _():
                bh = b_scr[t_a - T]  # beta_{t_a+1}
                b0r, b1r = beta_branches(bh, sa_a, pr_a)
                m0 = jnp.max(a + b0r, axis=0)
                m1 = jnp.max(a + b1r, axis=0)
                llr_ref[t_a - T] = m1 - m0

            # ---- beta at t_b (history stored shifted by T; only the entries
            # the alpha-side LLR emission will read: t in [half, T+L)) ----
            @pl.when(jnp.logical_and(t_b >= max(T, half), t_b < T + L))
            def _():
                b_scr[t_b - T] = b
            b0r, b1r = beta_branches(b, sa_b, pr_b)
            b_new = jnp.where(live_at(t_b), jnp.maximum(b0r, b1r), b)

            # beta-side LLR for t_b in [T, half): alpha history is complete
            @pl.when(jnp.logical_and(t_b < half, t_b >= T))
            def _():
                ah = a_scr[t_b]  # alpha_{t_b}
                m0 = jnp.max(ah + b0r, axis=0)
                m1 = jnp.max(ah + b1r, axis=0)
                llr_ref[t_b - T] = m1 - m0

            return a_new, b_new

        stl = jax.lax.broadcasted_iota(jnp.int32, (8, TILE), 0)
        a0 = jnp.where(jnp.logical_and(w_of_lane == 0, stl != 0),
                       f32(NEG), f32(0.0))
        jax.lax.fori_loop(0, S, step, (a0, b0_ref[:]), unroll=S)

    return kernel


@functools.partial(jax.jit, static_argnames=("L", "T"))
def siso_windowed_pallas(sys_apr, par, tail_x, tail_z, L: int = 128, T: int = 32):
    """Drop-in replacement for tdec._siso_windowed (f32 [B, K] in/out).

    K need not be a multiple of L (the last window is partially inactive).
    """
    B, K = sys_apr.shape
    W = -(-K // L)
    N = B * W
    LT = L + 2 * T
    n_pad = -(-N // TILE) * TILE

    pos = (np.arange(W) * L)[:, None] + np.arange(-T, L + T)[None, :]  # [W, LT]
    idx = jnp.asarray(np.clip(pos, 0, K - 1).astype(np.int32))
    act = jnp.asarray(((pos >= 0) & (pos < K)).astype(np.float32))[None]

    def windows(x):
        g = (x[:, idx] * act).reshape(N, LT).T  # [LT, N]
        return jnp.pad(g, ((0, 0), (0, n_pad - N)))

    sa_w, pr_w = windows(sys_apr), windows(par)

    bK = _tail_beta(tail_x, tail_z)  # [B, 8]
    b0 = jnp.zeros((B, W, 8), jnp.float32).at[:, W - 1].set(bK).reshape(N, 8)
    b0 = jnp.pad(b0, ((0, n_pad - N), (0, 0))).T

    grid = (n_pad // TILE,)
    col = lambda i: (0, i)
    llr = pl.pallas_call(
        _siso_kernel(L, T, K, W),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LT, TILE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((LT, TILE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, TILE), col, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T + L, 8, TILE), jnp.float32),
                        pltpu.VMEM((L, 8, TILE), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad * LT * 160), bytes_accessed=int(n_pad * LT * 12),
            transcendentals=0),
    )(sa_w, pr_w, b0)
    out = llr[:, :N].reshape(L, B, W).transpose(1, 2, 0).reshape(B, W * L)
    return out[:, :K]

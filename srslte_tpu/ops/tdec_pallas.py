"""Pallas TPU kernel: windowed max-log-MAP SISO, VMEM-resident.

The XLA scan version (fec/tdec.py _siso_windowed) spills the per-step alpha
metrics [LT, 8, N] to HBM between the forward and backward passes — at large
batch that traffic dominates (hundreds of MB per SISO).  This kernel keeps the
whole alpha history for a tile of windows in VMEM scratch: HBM traffic is just
the window inputs once in and the LLRs once out.

Window layout (one unified halo window per output window):
  positions wL-T .. wL+L+T-1  (length LT = L+2T)
  alpha runs forward over t in [0, T+L), exact state-0 init for window 0;
  beta runs backward over t in [T, L+2T), exact tail init for last window;
  llr emitted for t in [T, T+L) -> L outputs per window.
Inactive (out-of-block) positions carry metrics through unchanged, which
realizes both the exact edge initializations and the training halos.

Trellis: LTE PCCC RSC (g0=1+D^2+D^3 feedback, g1=1+D+D^3), 8 states,
statically unrolled (fec/turbo.py trellis_tables).
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


def _siso_kernel(L: int, T: int):
    preds, succs = _trellis_unrolled()
    LT = L + 2 * T
    # static sublane-gather index vectors: full-width [8, TILE] ops instead of
    # 8 single-sublane row ops per step
    n0s = [succs[s][0][0] for s in range(8)]  # u=0 successor permutation

    # Verify the closed-form trellis identities the kernel relies on, against
    # the canonical tables (turbo.trellis_tables):
    #   predecessor of s' via dropped bit b: s = ((s'&3)<<1)|b
    #   input consumed: u = bit2(s') ^ bit0(s') ^ b
    #   branch parity:  p = bit2(s') ^ bit1(s') ^ b
    from ..phy.fec.turbo import trellis_tables

    nxt_t, par_t, *_ = trellis_tables()
    for sp in range(8):
        for b in (0, 1):
            s = ((sp & 3) << 1) | b
            u = ((sp >> 2) ^ sp ^ b) & 1
            p = ((sp >> 2) ^ (sp >> 1) ^ b) & 1
            assert nxt_t[u, s] == sp and par_t[u, s] == p
    # beta: gamma(u=0, s) parity = bit1(s)^bit2(s); nxt1 = nxt0 ^ 4
    assert [int(par_t[0, s]) for s in range(8)] == [((s >> 1) ^ (s >> 2)) & 1 for s in range(8)]
    assert list(n0s) == [int(nxt_t[0, s]) for s in range(8)]
    assert [int(nxt_t[1, s]) for s in range(8)] == [x ^ 4 for x in n0s]

    def kernel(sa_ref, pr_ref, live_ref, a0_ref, b0_ref, llr_ref, alpha_scr):
        def gammas(t):
            sa = sa_ref[t]
            pr = pr_ref[t]
            return (None, pr, sa, sa + pr)  # g[(u<<1)|p]

        def alpha_body(t, a):
            alpha_scr[t] = a
            g = gammas(t)
            live = live_ref[t]
            rows = []
            for sp in range(8):
                (sA, uA, pA), (sB, uB, pB) = preds[sp]
                ga, gb = g[(uA << 1) | pA], g[(uB << 1) | pB]
                ra = a[sA] if ga is None else a[sA] + ga
                rb = a[sB] if gb is None else a[sB] + gb
                rows.append(jnp.maximum(ra, rb))
            new = jnp.stack(rows)
            return live * new + (1.0 - live) * a

        a_fin = jax.lax.fori_loop(0, T + L, alpha_body, a0_ref[:])
        alpha_scr[T + L] = a_fin  # unused; keeps scratch defined

        def beta_body(i, b):
            t = LT - 1 - i
            g = gammas(t)
            live = live_ref[t]
            alpha_k = alpha_scr[t]
            m0 = None
            m1 = None
            rows = []
            for s in range(8):
                (n0, p0), (n1, p1) = succs[s]
                g0, g1 = g[p0], g[2 | p1]
                b0r = b[n0] if g0 is None else b[n0] + g0
                b1r = b[n1] + g1
                rows.append(jnp.maximum(b0r, b1r))
                t0 = alpha_k[s] + b0r
                t1 = alpha_k[s] + b1r
                m0 = t0 if m0 is None else jnp.maximum(m0, t0)
                m1 = t1 if m1 is None else jnp.maximum(m1, t1)
            new = jnp.stack(rows)

            @pl.when(jnp.logical_and(t >= T, t < T + L))
            def _():
                llr_ref[t - T] = m1 - m0

            return live * new + (1.0 - live) * b

        jax.lax.fori_loop(0, L + T, beta_body, b0_ref[:])

    return kernel


@functools.partial(jax.jit, static_argnames=("L", "T"))
def siso_windowed_pallas(sys_apr, par, tail_x, tail_z, L: int = 128, T: int = 32):
    """Drop-in replacement for tdec._siso_windowed (f32 [B, K] in/out)."""
    B, K = sys_apr.shape
    W = K // L
    N = B * W
    LT = L + 2 * T
    n_pad = -(-N // TILE) * TILE

    pos = (np.arange(W) * L)[:, None] + np.arange(-T, L + T)[None, :]  # [W, LT]
    idx = jnp.asarray(np.clip(pos, 0, K - 1).astype(np.int32))
    act = jnp.asarray(((pos >= 0) & (pos < K)).astype(np.float32))[None]  # [1, W, LT]

    def windows(x):
        g = (x[:, idx] * act).reshape(N, LT).T  # [LT, N]
        return jnp.pad(g, ((0, 0), (0, n_pad - N)))

    sa_w, pr_w = windows(sys_apr), windows(par)
    live = jnp.pad(jnp.broadcast_to(act, (B, W, LT)).reshape(N, LT).T,
                   ((0, 0), (0, n_pad - N)))

    lane = np.arange(n_pad)
    a0 = jnp.asarray(np.where((lane % W == 0)[None, :] & (lane < N)[None, :]
                              & (np.arange(8) != 0)[:, None], NEG, 0.0).astype(np.float32))
    bK = _tail_beta(tail_x, tail_z)  # [B, 8]
    b0 = jnp.zeros((B, W, 8), jnp.float32).at[:, W - 1].set(bK).reshape(N, 8).T
    b0 = jnp.pad(b0, ((0, 0), (0, n_pad - N)))

    grid = (n_pad // TILE,)
    col = lambda i: (0, i)
    llr = pl.pallas_call(
        _siso_kernel(L, T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((LT, TILE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((LT, TILE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((LT, TILE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, TILE), col, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T + L + 1, 8, TILE), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad * LT * 120), bytes_accessed=int(n_pad * LT * 16),
            transcendentals=0),
    )(sa_w, pr_w, live, a0, b0)
    return llr[:, :N].reshape(L, B, W).transpose(1, 2, 0).reshape(B, K)

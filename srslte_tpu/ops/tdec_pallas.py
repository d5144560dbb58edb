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
- The 8 trellis state metrics are EIGHT SEPARATE (8, 128) arrays — each
  exactly one full VPU register of WINDOWS (SUB*LANE = 1024 windows per
  program).  The trellis predecessor/successor "gather" is plain Python
  list indexing resolved at trace time: zero data movement, and every
  elementwise op runs at full (8, 128) vector-register utilization.  (The
  previous layout kept states on sublanes, [8, TILE]: every per-state row
  op then occupied whole vregs at 1/8 sublane utilization — measured 0.55
  VPU instructions per window-step vs ~0.11 for this layout.)
- Branch gammas come from the closed trellis identities (verified in
  _check_identities against turbo.trellis_tables):
    alpha, into s' dropping bit b: pred = ((s'&3)<<1)|b,
      u = bit2^bit0(s') ^ b, parity = bit2^bit1(s') ^ b
    beta, from s with input u=0: next n0 = (s>>1)|((bit0^bit1)(s)<<2),
      parity p0 = (bit1^bit2)(s); u=1: n1 = n0^4, p1 = p0^1.
- LLRs are emitted inside the SAME loop, predicated: position t is finished
  by whichever recursion visits it second (alpha for t past the midpoint,
  beta before it), reading the other side's stored history.  The histories
  only span the provably-accessed ranges (alpha: [0, half), beta:
  [half, T+L)), halving VMEM scratch.

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

SUB, LANE = 8, 128
TILE = SUB * LANE  # windows per program (one full vreg per state metric)

# bf16 variant: a (16, 128) bf16 array is ONE packed vreg (the Mosaic min
# tile for bfloat16), so doubling the sublane count doubles windows-per-
# instruction.  Path metrics then need per-step normalization: bf16 keeps
# f32's exponent but only 8 mantissa bits, and unnormalized metrics grow to
# ~4e3 over an L+2T window (resolution 16 — fatal); pinned to state 0 = 0
# they stay within the trellis mixing bound (a few x max|gamma|).
SUB_BF16 = 16


def _subs_for(dtype) -> int:
    return SUB_BF16 if dtype == jnp.bfloat16 else SUB


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


def _tree_max(xs):
    while len(xs) > 1:
        xs = [jnp.maximum(xs[i], xs[i + 1]) for i in range(0, len(xs) - 1, 2)] \
            + ([xs[-1]] if len(xs) & 1 else [])
    return xs[0]


def _siso_kernel(L: int, T: int, K: int, W: int, emit_ext: bool = False,
                 dtype=jnp.float32):
    """emit_ext: write the EXTRINSIC (llr - sa) instead of the posterior —
    the turbo loop's inter-SISO algebra then needs no extra [B, K] pass."""
    _check_identities()
    LT = L + 2 * T
    S = T + L  # merged loop steps
    half = (LT - 1) // 2 + 1  # first i with t_a=i visited after beta
    OFF = half - T  # beta history only holds indices [OFF, L)
    f32 = dtype
    subs = _subs_for(dtype)
    tile = subs * LANE
    norm = dtype == jnp.bfloat16  # pin state 0 to 0 each step (see SUB_BF16)

    preds, succs = _trellis_unrolled()

    def kernel(sa_ref, pr_ref, b0_ref, llr_ref, a_scr, b_scr):
        # window index of each (sublane, lane) element of this program.
        sub = jax.lax.broadcasted_iota(jnp.int32, (subs, LANE), 0)
        ln = jax.lax.broadcasted_iota(jnp.int32, (subs, LANE), 1)
        w_of = (pl.program_id(0) * tile + sub * LANE + ln) % W

        # bf16 runs (16, 128)-packed vregs, but an int32-sourced i1 compare
        # mask carries (8, 128) tiling that Mosaic cannot relayout to the
        # packed shape (and 16-bit iota is unsupported in hardware) — so the
        # bf16 path blends arithmetically with 0/1 masks converted through
        # f32 -> bf16 (an ordinary pack), while f32 keeps vector select.
        if norm:
            def as_mask(b):
                return b.astype(jnp.float32).astype(f32)

            def select(mask, a, b):
                # NOT (a-b)*mask + b: with b = the -1e9 rail, (a-b) rounds
                # to 1e9 in bf16 and re-adding b cancels to exactly 0
                # instead of a.  The two-product form is exact at both ends.
                return a * mask + b * (1.0 - mask)
        else:
            as_mask = None
            select = jnp.where

        def live_at(t):
            pos = w_of * L + (t - T)
            live = jnp.logical_and(pos >= 0, pos < K)
            return as_mask(live) if norm else live

        def gammas(sa, pr):
            return (None, pr, sa, sa + pr)

        def alpha_step(A, sa, pr):
            g = gammas(sa, pr)
            out = []
            for sp in range(8):
                (sA, uA, pA), (sB, uB, pB) = preds[sp]
                ga, gb = g[(uA << 1) | pA], g[(uB << 1) | pB]
                ra = A[sA] if ga is None else A[sA] + ga
                rb = A[sB] if gb is None else A[sB] + gb
                out.append(jnp.maximum(ra, rb))
            return out

        def beta_branches(B, sa, pr):
            g = gammas(sa, pr)
            r0, r1 = [], []
            for s in range(8):
                (n0, p0_), (n1, p1_) = succs[s]
                g0, g1 = g[p0_], g[2 | p1_]
                r0.append(B[n0] if g0 is None else B[n0] + g0)
                r1.append(B[n1] + g1)
            return r0, r1

        def step(i, carry):
            # i is a PYTHON int: every ref index below is a trace-time
            # constant (static VMEM addressing) and every range predicate
            # resolves at trace time (no in-kernel control flow at all).
            A, B = carry
            t_a = i
            t_b = LT - 1 - i
            sa_a, pr_a = sa_ref[t_a, 0], pr_ref[t_a, 0]
            sa_b, pr_b = sa_ref[t_b, 0], pr_ref[t_b, 0]

            # ---- alpha at t_a (history read by the beta-side LLR, t < half)
            if t_a < half:
                for s in range(8):
                    a_scr[t_a, s] = A[s]
            ra = alpha_step(A, sa_a, pr_a)
            live_a = live_at(t_a)
            A_new = [select(live_a, ra[s], A[s]) for s in range(8)]
            if norm:
                a0 = A_new[0]
                A_new = [jnp.zeros((subs, LANE), f32)] + \
                    [A_new[s] - a0 for s in range(1, 8)]

            # alpha-side LLR for t_a in [half, T+L): beta history is complete
            if half <= t_a < T + L:
                Bh = [b_scr[t_a - T - OFF, s] for s in range(8)]
                b0r, b1r = beta_branches(Bh, sa_a, pr_a)
                m0 = _tree_max([A[s] + b0r[s] for s in range(8)])
                m1 = _tree_max([A[s] + b1r[s] for s in range(8)])
                llr_ref[t_a - T, 0] = (m1 - m0 - sa_a) if emit_ext else (m1 - m0)

            # ---- beta at t_b (store only the entries the alpha-side LLR
            # emission will read: t in [half, T+L)) ----
            if max(T, half) <= t_b < T + L:
                for s in range(8):
                    b_scr[t_b - T - OFF, s] = B[s]
            b0r, b1r = beta_branches(B, sa_b, pr_b)
            live_b = live_at(t_b)
            B_new = [select(live_b, jnp.maximum(b0r[s], b1r[s]), B[s])
                     for s in range(8)]
            if norm:
                nb0 = B_new[0]
                B_new = [jnp.zeros((subs, LANE), f32)] + \
                    [B_new[s] - nb0 for s in range(1, 8)]

            # beta-side LLR for t_b in [T, half): alpha history is complete
            if T <= t_b < half:
                Ah = [a_scr[t_b, s] for s in range(8)]
                m0 = _tree_max([Ah[s] + b0r[s] for s in range(8)])
                m1 = _tree_max([Ah[s] + b1r[s] for s in range(8)])
                llr_ref[t_b - T, 0] = (m1 - m0 - sa_b) if emit_ext else (m1 - m0)

            return A_new, B_new

        zero = jnp.zeros((subs, LANE), f32)
        if norm:
            neg_nonfirst = as_mask(w_of == 0) * jnp.asarray(NEG, f32)
        else:
            neg_nonfirst = jnp.where(w_of == 0, jnp.asarray(NEG, f32),
                                     jnp.asarray(0.0, f32))
        carry = ([zero] + [neg_nonfirst] * 7, [b0_ref[s, 0] for s in range(8)])
        for i in range(S):
            carry = step(i, carry)

    return kernel


@functools.partial(jax.jit, static_argnames=("K", "L", "T", "dtype"))
def prepare_windows(x, K: int, L: int = 128, T: int = 32, perm=None,
                    dtype=jnp.float32):
    """[B, K] -> kernel window layout [LT, NP, subs, LANE] (cacheable: the
    parity inputs never change across turbo iterations).

    `perm` [K] composes an input permutation into the window gather:
    windows of x[:, perm] in ONE gather — the QPP interleave ahead of the
    second SISO never materializes as a [B, K] intermediate."""
    B = x.shape[0]
    subs = _subs_for(dtype)
    tile = subs * LANE
    W = -(-K // L)
    N = B * W
    LT = L + 2 * T
    n_pad = -(-N // tile) * tile
    NP = n_pad // tile
    pos = (np.arange(W) * L)[:, None] + np.arange(-T, L + T)[None, :]  # [W, LT]
    idx = jnp.asarray(np.clip(pos, 0, K - 1).astype(np.int32))
    if perm is not None:
        idx = perm[idx].astype(jnp.int32)
    act = jnp.asarray(((pos >= 0) & (pos < K)).astype(np.float32))[None]
    g = (x.astype(dtype)[:, idx] * act.astype(dtype)).reshape(N, LT).T
    return jnp.pad(g, ((0, 0), (0, n_pad - N))).reshape(LT, NP, subs, LANE)


@functools.partial(jax.jit, static_argnames=("K", "L", "T", "dtype"))
def prepare_windows_roll(x, K: int, L: int = 128, T: int = 32,
                         dtype=jnp.float32):
    """Gather-free prepare_windows for the unpermuted case.

    The window tensor is three shifted views of the L-blocked input
    (previous window's tail, the window, next window's head) — pure
    pad/reshape/slice/concat, no gather op for XLA to serialize.  Output is
    bit-identical to prepare_windows(x, K, L, T, dtype=dtype).
    """
    B = x.shape[0]
    subs = _subs_for(dtype)
    tile = subs * LANE
    W = -(-K // L)
    N = B * W
    LT = L + 2 * T
    n_pad = -(-N // tile) * tile
    NP = n_pad // tile
    xp = jnp.pad(x.astype(dtype), ((0, 0), (0, W * L - K)))  # zeros == inactive
    base = xp.reshape(B, W, L)
    zt = jnp.zeros((B, 1, T), dtype)
    prev = jnp.concatenate([zt, base[:, :-1, L - T:]], axis=1)
    nxt = jnp.concatenate([base[:, 1:, :T], zt], axis=1)
    g = jnp.concatenate([prev, base, nxt], axis=2)  # [B, W, LT]
    g = g.reshape(N, LT).T
    return jnp.pad(g, ((0, 0), (0, n_pad - N))).reshape(LT, NP, subs, LANE)


@functools.partial(jax.jit, static_argnames=("B", "K", "L", "T", "dtype"))
def prepare_beta_init(tail_x, tail_z, B: int, K: int, L: int = 128,
                      T: int = 32, dtype=jnp.float32):
    """Exact tail beta for the last window (cacheable across iterations)."""
    subs = _subs_for(dtype)
    tile = subs * LANE
    W = -(-K // L)
    N = B * W
    n_pad = -(-N // tile) * tile
    NP = n_pad // tile
    bK = _tail_beta(tail_x.astype(jnp.float32), tail_z.astype(jnp.float32))
    b0 = jnp.zeros((B, W, 8), jnp.float32).at[:, W - 1].set(bK).reshape(N, 8)
    b0 = jnp.pad(b0, ((0, n_pad - N), (0, 0))).astype(dtype)
    return b0.T.reshape(8, NP, subs, LANE)


@functools.partial(jax.jit, static_argnames=("B", "K", "L", "T"))
def take_windows(wt, idx, B: int, K: int, L: int = 128, T: int = 32):
    """CB-subset of a window tensor: rows of wt for code blocks idx.

    wt: [lead, NP, subs, LANE] window-major layout (lead = LT or 8) whose
    flattened window index is n = b*W + w for b in [0, B).  Returns the same
    layout re-packed for the cap = len(idx) selected code blocks — the turbo
    cascade's compaction step without rebuilding windows from LLRs.
    """
    dtype = wt.dtype
    subs = _subs_for(dtype)
    tile = subs * LANE
    lead = wt.shape[0]
    W = -(-K // L)
    n_pad = wt.shape[1] * tile
    flat = wt.reshape(lead, n_pad)[:, : B * W].reshape(lead, B, W)
    sub = flat[:, idx]  # [lead, cap, W]
    cap = idx.shape[0]
    n2 = cap * W
    n_pad2 = -(-n2 // tile) * tile
    out = jnp.pad(sub.reshape(lead, n2), ((0, 0), (0, n_pad2 - n2)))
    return out.reshape(lead, n_pad2 // tile, subs, LANE)


@functools.partial(jax.jit, static_argnames=("B", "K", "L", "T", "emit_ext"))
def siso_from_windows(sa_w, pr_w, b0, B: int, K: int, L: int = 128,
                      T: int = 32, emit_ext: bool = False):
    """Run the kernel on pre-built window tensors -> LLRs (or extrinsics,
    with emit_ext) [B, K].  Compute dtype (f32 or bf16) follows sa_w: a
    (16, 128) bf16 tile is one packed vreg, so the bf16 path runs twice the
    windows per VPU instruction and halves HBM traffic (ADVICE r2: this
    plumbing makes the kernel's bf16 variant reachable)."""
    dtype = sa_w.dtype
    subs = _subs_for(dtype)
    tile = subs * LANE
    W = -(-K // L)
    N = B * W
    LT = L + 2 * T
    n_pad = -(-N // tile) * tile
    NP = n_pad // tile
    half = (LT - 1) // 2 + 1
    llr = pl.pallas_call(
        _siso_kernel(L, T, K, W, emit_ext, dtype=dtype),
        # off-TPU (tests, CI): run the kernel in the Pallas interpreter so
        # the cached/composed-gather decode path is exercised everywhere
        interpret=jax.default_backend() != "tpu",
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((LT, 1, subs, LANE), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LT, 1, subs, LANE), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1, subs, LANE), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, 1, subs, LANE), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, NP, subs, LANE), dtype),
        scratch_shapes=[pltpu.VMEM((half, 8, subs, LANE), dtype),
                        pltpu.VMEM((L + T - half, 8, subs, LANE), dtype)],
        # metric histories + double-buffered window blocks exceed the 16 MiB
        # default scoped-vmem budget for L > 128; v5e has 128 MiB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad * LT * 160),
            bytes_accessed=int(n_pad * LT * 3 * np.dtype(dtype).itemsize),
            transcendentals=0),
    )(sa_w, pr_w, b0)
    out = llr.reshape(L, n_pad)[:, :N].reshape(L, B, W).transpose(1, 2, 0)
    return out.reshape(B, W * L)[:, :K]


@functools.partial(jax.jit, static_argnames=("L", "T", "dtype"))
def siso_windowed_pallas(sys_apr, par, tail_x, tail_z, L: int = 128,
                         T: int = 32, dtype=jnp.float32):
    """Drop-in replacement for tdec._siso_windowed ([B, K] in/out; returns
    the input dtype's LLRs cast back to the input dtype).

    K need not be a multiple of L (the last window is partially inactive).
    """
    B, K = sys_apr.shape
    sa_w = prepare_windows(sys_apr, K, L, T, dtype=dtype)
    pr_w = prepare_windows(par, K, L, T, dtype=dtype)
    b0 = prepare_beta_init(tail_x, tail_z, B, K, L, T, dtype=dtype)
    out = siso_from_windows(sa_w, pr_w, b0, B, K, L, T)
    return out.astype(sys_apr.dtype)

"""Turbo decoder: iterative max-log-MAP (36.212 §5.1.3.2).

Reference behavior: lib/src/phy/fec/turbo/{turbodecoder.c, turbodecoder_sse.c}
(windowed max-log-MAP, 8/16-bit).  TPU-first: the SISO alpha/beta recursions
run as lax.scan over trellis steps with the whole codeblock *batch* vectorized
in the state ([B, 8] metrics per step) — throughput comes from decoding many
codeblocks per dispatch, matching how the reference batches CBs per transport
block (sch.c:391-446).

LLR convention: positive ⇒ bit 1 (matches demod_soft.c, scrambling flips).
Trellis tables from turbo.trellis_tables(); tail handling terminates each
constituent trellis through the 3 tail steps using the received tail LLRs.

Inputs use the dcat layout produced by turbo.rm_rx: [d0 | d1 | d2], each
stream K+4 long (data + re-arranged tails, 36.212 §5.1.3.2.2).
"""

from __future__ import annotations

import functools

import numpy as np

from .turbo import qpp_perm, qpp_perm_inv, trellis_tables

NEG = -1e9


@functools.lru_cache(maxsize=1)
def _pred_tables():
    """Predecessor tables: for each state s', its 2 (prev_state, input, parity)."""
    nxt, par, *_ = trellis_tables()
    pred_s = np.zeros((8, 2), np.int32)
    pred_u = np.zeros((8, 2), np.int32)
    pred_p = np.zeros((8, 2), np.int32)
    cnt = [0] * 8
    for u in range(2):
        for s in range(8):
            sp = nxt[u, s]
            pred_s[sp, cnt[sp]] = s
            pred_u[sp, cnt[sp]] = u
            pred_p[sp, cnt[sp]] = par[u, s]
            cnt[sp] += 1
    assert all(c == 2 for c in cnt)
    return pred_s, pred_u, pred_p


def _tail_beta(tail_x, tail_z):
    """beta_K[s] from the 3 termination steps.

    tail_x/tail_z: [..., 3] LLRs of the tail systematic/parity bits.
    From state s the tail emits x(s)=s1^s2, z(s)=s0^s2 and shifts in a zero.
    """
    import jax.numpy as jnp

    _, _, tx, tz, tnext = trellis_tables()
    txj, tzj, tnj = jnp.asarray(tx), jnp.asarray(tz), jnp.asarray(tnext)
    # beta after all tails: 0 for state 0 else -inf
    beta = jnp.full(tail_x.shape[:-1] + (8,), NEG, jnp.float32).at[..., 0].set(0.0)
    for i in (2, 1, 0):
        metric = txj * tail_x[..., i : i + 1] + tzj * tail_z[..., i : i + 1]
        beta = beta[..., tnj] + metric
        beta = beta - beta.max(axis=-1, keepdims=True)
    return beta


def _siso(sys_apr, par, tail_x, tail_z):
    """One max-log-MAP pass.

    sys_apr: [B, K] systematic+apriori LLR; par: [B, K] parity LLR;
    tail_x/tail_z: [B, 3].  Returns full LLR [B, K].
    Branch metric for (u, s): u*sys_apr + p(u,s)*par (max-log, scale-free).
    """
    import jax
    import jax.numpy as jnp

    nxt, parity, *_ = trellis_tables()
    pred_s, pred_u, pred_p = _pred_tables()
    nxt_j = jnp.asarray(nxt)  # [2, 8]
    par_j = jnp.asarray(parity.astype(np.float32))  # [2, 8]
    ps, pu, pp = (jnp.asarray(a) for a in (pred_s, pred_u.astype(np.float32),
                                           pred_p.astype(np.float32)))

    xs = jnp.stack([sys_apr, par], axis=-1)  # [B, K, 2]
    xs_t = jnp.moveaxis(xs, 1, 0)  # [K, B, 2]

    def alpha_step(a, x):
        sa, pr = x[..., 0], x[..., 1]  # [B]
        # candidates for each new state: a[pred] + u*sa + p*par
        cand = a[:, ps] + pu[None] * sa[:, None, None] + pp[None] * pr[:, None, None]
        new = cand.max(axis=-1)
        new = new - new.max(axis=-1, keepdims=True)
        return new, a  # emit alpha BEFORE this step (alpha_k)

    a0 = jnp.full((sys_apr.shape[0], 8), NEG, jnp.float32).at[:, 0].set(0.0)
    _, alphas = jax.lax.scan(alpha_step, a0, xs_t)  # [K, B, 8] = alpha_k

    beta_K = _tail_beta(tail_x, tail_z)  # [B, 8]

    def beta_step(b, x):
        alpha_k, sa, pr = x  # [B,8], [B], [B]
        # gamma for (u, s): u*sa + parity[u,s]*pr  -> [B, 2, 8]
        g = (jnp.arange(2, dtype=jnp.float32)[None, :, None] * sa[:, None, None]
             + par_j[None] * pr[:, None, None])
        # LLR_k: max over u=1 branches vs u=0 branches of alpha + gamma + beta[next]
        tot = alpha_k[:, None, :] + g + b[:, nxt_j]  # [B, 2, 8]
        m = tot.max(axis=-1)  # [B, 2]
        llr_k = m[:, 1] - m[:, 0]
        # beta_k[s] = max_u beta_{k+1}[nxt[u,s]] + gamma(u,s)
        nb = (b[:, nxt_j] + g).max(axis=1)
        nb = nb - nb.max(axis=-1, keepdims=True)
        return nb, llr_k

    xs_rev = (alphas[::-1], xs_t[::-1, :, 0], xs_t[::-1, :, 1])
    _, llr_rev = jax.lax.scan(beta_step, beta_K, xs_rev)
    return jnp.moveaxis(llr_rev[::-1], 0, 1)  # [B, K]


@functools.lru_cache(maxsize=1)
def _trellis_unrolled():
    """Static trellis lists for the state-major kernels.

    PREDS[s'] = ((sA, uA, pA), (sB, uB, pB)) — the two branches into s'.
    SUCCS[s] = ((n0, p0), (n1, p1)) — next state / parity for u=0, u=1.
    """
    nxt, par, *_ = trellis_tables()
    pred_s, pred_u, pred_p = _pred_tables()
    preds = tuple(
        tuple((int(pred_s[sp, i]), int(pred_u[sp, i]), int(pred_p[sp, i])) for i in range(2))
        for sp in range(8))
    succs = tuple(
        tuple((int(nxt[u, s]), int(par[u, s])) for u in range(2)) for s in range(8))
    return preds, succs


def _siso_windowed(sys_apr, par, tail_x, tail_z, L: int, T: int):
    """Windowed max-log-MAP: scans of length L+T over B*W parallel windows.

    Equivalent role to the reference's windowed SSE decoder
    (turbodecoder_sse.c, window impls turbodecoder.c:50-72): alpha for window
    w trains on the T real positions before it (exact delta-at-zero init for
    window 0 via inactive halo steps); beta trains on the T positions after
    (exact tail termination for the last window).  Sequential depth drops from
    K to L+T; the VPU batch grows by W.

    Layout is state-major [8, N] (states on sublanes, N = B*W windows on
    lanes) with a statically unrolled trellis — no gathers in the scan body,
    and no per-step normalization (fp32 headroom covers L+T ~ 160 steps).
    """
    import jax
    import jax.numpy as jnp

    preds, succs = _trellis_unrolled()
    B, K = sys_apr.shape
    W = -(-K // L)  # last window may be partially inactive (K % L != 0)
    N = B * W
    w_starts = np.arange(W) * L

    def window_inputs(pos):
        idx = np.clip(pos, 0, K - 1).astype(np.int32)
        act = jnp.asarray((pos >= 0) & (pos <= K - 1), jnp.float32)[None]  # [1, W, LT]
        sa = sys_apr[:, jnp.asarray(idx)] * act  # [B, W, LT]
        pr = par[:, jnp.asarray(idx)] * act
        lt = pos.shape[-1]
        # -> [LT, N] step-major, lanes = windows
        sa = sa.reshape(N, lt).T
        pr = pr.reshape(N, lt).T
        live = jnp.broadcast_to(act, (B, W, lt)).reshape(N, lt).T
        return sa, pr, live

    # --- alpha: positions wL-T .. wL+L-1 ------------------------------------
    sa_a, pr_a, live_a = window_inputs(w_starts[:, None] + np.arange(-T, L)[None, :])

    def alpha_step(a, x):
        sa, pr, live = x  # [N]
        g = (None, pr, sa, sa + pr)  # g[(u<<1)|p]; g[0] = 0
        rows = []
        for sp in range(8):
            (sA, uA, pA), (sB, uB, pB) = preds[sp]
            ga = g[(uA << 1) | pA]
            gb = g[(uB << 1) | pB]
            ra = a[sA] if ga is None else a[sA] + ga
            rb = a[sB] if gb is None else a[sB] + gb
            rows.append(jnp.maximum(ra, rb))
        new = jnp.stack(rows)  # [8, N]
        new = live * new + (1.0 - live) * a  # inactive: carry through
        return new, a  # emit alpha BEFORE this step

    # init: window 0 of each CB starts exactly in state 0; training windows
    # start uniform (lane n = b*W + w, so window-0 lanes are n % W == 0)
    a0 = jnp.where(
        (jnp.arange(N) % W == 0)[None, :] & (jnp.arange(8) != 0)[:, None], NEG,
        jnp.zeros((8, N), jnp.float32))
    _, alphas = jax.lax.scan(alpha_step, a0, (sa_a, pr_a, live_a))  # [LT, 8, N]

    # --- beta + llr: positions wL .. wL+L+T-1 -------------------------------
    sa_b, pr_b, live_b = window_inputs(w_starts[:, None] + np.arange(L + T)[None, :])

    bK = _tail_beta(tail_x, tail_z)  # [B, 8]
    b0 = jnp.zeros((B, W, 8), jnp.float32).at[:, W - 1].set(bK)
    b0 = b0.reshape(N, 8).T  # [8, N]; uniform 0 for training windows

    # alpha BEFORE each real position: scan steps T..T+L-1; pad halo with zeros
    alphas_ext = jnp.concatenate(
        [alphas[T:], jnp.zeros((T, 8, N), jnp.float32)], axis=0)

    def beta_step(b, x):
        sa, pr, live, alpha_k = x
        g = (None, pr, sa, sa + pr)
        # beta_k[s] = max_u b[nxt[u,s]] + gamma(u,s); llr from u=1 vs u=0 branches
        m1 = None
        m0 = None
        rows = []
        for s in range(8):
            (n0, p0), (n1, p1) = succs[s]
            g0 = g[p0]  # u=0: gamma = p*pr
            g1 = g[2 | p1]  # u=1: gamma = sa + p*pr
            b0r = b[n0] if g0 is None else b[n0] + g0
            b1r = b[n1] + g1
            rows.append(jnp.maximum(b0r, b1r))
            t0 = alpha_k[s] + b0r
            t1 = alpha_k[s] + b1r
            m0 = t0 if m0 is None else jnp.maximum(m0, t0)
            m1 = t1 if m1 is None else jnp.maximum(m1, t1)
        new = jnp.stack(rows)
        new = live * new + (1.0 - live) * b
        return new, m1 - m0

    xs_rev = (sa_b[::-1], pr_b[::-1], live_b[::-1], alphas_ext[::-1])
    _, llr_rev = jax.lax.scan(beta_step, b0, xs_rev)
    llr_w = llr_rev[::-1][:L]  # [L, N]
    out = llr_w.reshape(L, B, W).transpose(1, 2, 0).reshape(B, W * L)
    return out[:, :K]


def default_window(k: int) -> int | None:
    """Window length (K need not divide it — the tail is masked); None = full scan.

    Larger windows amortize the 2T-step training halo over more useful
    positions (work scales with 1 + 2T/L), at the price of per-program VMEM
    for the metric histories; 256 fits v5e VMEM with the raised scoped limit
    (ops/tdec_pallas.py) and is never worse for BLER than 128."""
    if k >= 2048:
        return 256
    return 128 if k >= 256 else None


@functools.lru_cache(maxsize=1)
def _pallas_ok() -> bool:
    """Use the Pallas SISO kernel when running on a real TPU backend."""
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def siso_dtype():
    """Compute dtype for the Pallas SISO path: bf16 on real TPUs (a (16,128)
    bf16 tile is one packed vreg — 2x windows per VPU instruction and half
    the HBM traffic; per-step metric normalization keeps bf16's 8 mantissa
    bits sufficient, cf. the reference's int8 decoder tdec_iteration_8),
    f32 elsewhere.  Override with SRSLTE_TPU_SISO_DTYPE=f32|bf16."""
    import os

    import jax.numpy as jnp

    v = os.environ.get("SRSLTE_TPU_SISO_DTYPE", "auto")
    if v == "f32":
        return jnp.float32
    if v == "bf16":
        return jnp.bfloat16
    return jnp.bfloat16 if _pallas_ok() else jnp.float32


# ---------------------------------------------------------------------------
# Resumable decoder state (Pallas cached path)
#
# The turbo cascade in dlsch.py runs phases (1 iter -> CRC -> +1 iter -> CRC
# -> compacted rest).  Rebuilding the window tensors, tail-beta inits and the
# fixed-point scale from the dcat LLRs at every phase costs more device time
# than a whole iteration — so the prepared tensors and the inter-SISO
# extrinsics are threaded through the phases as one pytree.  Mirrors how the
# reference keeps one srsran_tdec_t state across run_all calls
# (turbodecoder.c:510 new_cb / :536 run_all).
# ---------------------------------------------------------------------------

from typing import Any, NamedTuple


class TurboState(NamedTuple):
    """Resumable turbo decoder state (pytree; static shape per (B, K))."""

    sys: Any  # [B, K] f32 original systematic LLR (posterior exactness)
    sys_d: Any  # [B, K] dtype, scaled, unsaturated
    w_sys: Any  # window tensor of sat(scaled sys)
    pr1_w: Any  # parity-1 windows (iteration-invariant)
    pr2_w: Any
    b01: Any  # tail-beta inits (iteration-invariant)
    b02: Any
    e1: Any  # [B, K] dtype, decoder-1 extrinsic (natural order)
    ext2: Any  # [B, K] dtype, decoder-2 extrinsic (interleaved domain)
    sc: Any  # [] f32 fixed-point scale (1.0 on the f32 path)


_BF16_TARGET = 8.0  # mean |sys| after scaling
_BF16_CLIP = 32.0  # decoder-input saturation (cf. tdec_iteration_8's +-127)


def state_supported(k: int, window: int | None = 0) -> bool:
    """True when the resumable Pallas state path applies for this K."""
    import os

    if os.environ.get("SRSLTE_TPU_SISO_CACHE", "1") == "0":
        return False
    if window == 0:
        window = default_window(k) if k >= 256 else None
    force = os.environ.get("SRSLTE_TPU_FORCE_PALLAS", "0") == "1"
    return bool(window) and (_pallas_ok() or force)


def _split_dcat(dcat_llr, k: int):
    import jax.numpy as jnp

    d = k + 4
    d0, d1, d2 = dcat_llr[..., :d], dcat_llr[..., d : 2 * d], dcat_llr[..., 2 * d :]
    sys, par1, par2 = d0[..., :k], d1[..., :k], d2[..., :k]
    t1x = jnp.stack([d0[..., k], d2[..., k], d1[..., k + 1]], axis=-1)
    t1z = jnp.stack([d1[..., k], d0[..., k + 1], d2[..., k + 1]], axis=-1)
    t2x = jnp.stack([d0[..., k + 2], d2[..., k + 2], d1[..., k + 3]], axis=-1)
    t2z = jnp.stack([d1[..., k + 2], d0[..., k + 3], d2[..., k + 3]], axis=-1)
    return sys, par1, par2, (t1x, t1z), (t2x, t2z)


def turbo_start(dcat_llr, k: int, L: int = 0, T: int = 32) -> TurboState:
    """Prepare a resumable decoder state from dcat LLRs [B, 3*(K+4)]."""
    import jax.numpy as jnp

    from ...ops.tdec_pallas import prepare_beta_init, prepare_windows_roll

    if L == 0:
        L = default_window(k) or 128
    dt = siso_dtype()
    sys, par1, par2, (t1x, t1z), (t2x, t2z) = _split_dcat(dcat_llr, k)
    B = sys.shape[0]
    if dt == jnp.bfloat16:
        sc = _BF16_TARGET / (jnp.mean(jnp.abs(sys)) + 1e-20)
        sat = lambda x: jnp.clip(x, -_BF16_CLIP, _BF16_CLIP)
    else:
        sc = jnp.float32(1.0)
        sat = lambda x: x
    sys_s = sys * sc
    return TurboState(
        sys=sys,
        sys_d=sys_s.astype(dt),
        w_sys=prepare_windows_roll(sat(sys_s), k, L, T, dtype=dt),
        pr1_w=prepare_windows_roll(sat(par1 * sc), k, L, T, dtype=dt),
        pr2_w=prepare_windows_roll(sat(par2 * sc), k, L, T, dtype=dt),
        b01=prepare_beta_init(t1x * sc, t1z * sc, B, k, L, T, dtype=dt),
        b02=prepare_beta_init(t2x * sc, t2z * sc, B, k, L, T, dtype=dt),
        e1=jnp.zeros_like(sys_s, dtype=dt),
        ext2=jnp.zeros_like(sys_s, dtype=dt),
        sc=sc,
    )


def turbo_step(st: TurboState, k: int, n_iter: int, L: int = 0, T: int = 32,
               first: bool = False) -> TurboState:
    """Run n_iter turbo iterations on a prepared state (resumable).

    first=True skips the decoder-2-extrinsic window gather of the very first
    sub-iteration (ext2 is identically zero in a fresh state).
    """
    import jax.numpy as jnp

    from ...ops.tdec_pallas import prepare_windows, siso_from_windows

    if L == 0:
        L = default_window(k) or 128
    dt = st.sys_d.dtype
    B = st.sys_d.shape[0]
    if dt == jnp.bfloat16:
        sat = lambda x: jnp.clip(x, -_BF16_CLIP, _BF16_CLIP)
    else:
        sat = lambda x: x
    pi = jnp.asarray(qpp_perm(k))
    pi_inv = jnp.asarray(qpp_perm_inv(k))

    e1, ext2 = st.e1, st.ext2
    for it in range(n_iter):
        if first and it == 0:
            w1 = st.w_sys
        else:
            w1 = sat(st.w_sys + prepare_windows(ext2, k, L, T, perm=pi_inv,
                                                dtype=dt))
        e1 = siso_from_windows(w1, st.pr1_w, st.b01, B, k, L, T, emit_ext=True)
        w2 = prepare_windows(sat(st.sys_d + e1), k, L, T, perm=pi, dtype=dt)
        ext2 = siso_from_windows(w2, st.pr2_w, st.b02, B, k, L, T,
                                 emit_ext=True)
    return st._replace(e1=e1, ext2=ext2)


def turbo_hard(st: TurboState, k: int):
    """Posterior from state -> (hard bits [B, K] uint8, post f32, apr1 f32)."""
    import jax.numpy as jnp

    pi_inv = jnp.asarray(qpp_perm_inv(k))
    apr1 = st.ext2[..., pi_inv].astype(jnp.float32) / st.sc
    post = st.sys + st.e1.astype(jnp.float32) / st.sc + apr1
    return (post > 0).astype(jnp.uint8), post, apr1


def turbo_take(st: TurboState, idx, k: int, L: int = 0,
               T: int = 32) -> TurboState:
    """Compact the state to the code-block subset idx (static length)."""
    from ...ops.tdec_pallas import take_windows

    if L == 0:
        L = default_window(k) or 128
    B = st.sys_d.shape[0]
    tw = lambda wt: take_windows(wt, idx, B, k, L, T)
    return TurboState(
        sys=st.sys[idx], sys_d=st.sys_d[idx],
        w_sys=tw(st.w_sys), pr1_w=tw(st.pr1_w), pr2_w=tw(st.pr2_w),
        b01=tw(st.b01), b02=tw(st.b02),
        e1=st.e1[idx], ext2=st.ext2[idx], sc=st.sc)


def turbo_decode(dcat_llr, k: int, n_iter: int = 5, window: int | None = 0,
                 backend: str = "auto", apr0=None, return_state: bool = False):
    """Decode a batch: dcat_llr [B, 3*(K+4)] -> (hard bits [B, K] uint8, llr [B, K]).

    dcat layout per turbo.turbo_encode_np.  Jittable; static (k, n_iter).
    window: max-log-MAP window length (must divide K); 0 = auto (windowed for
    K >= 256, sequential depth L+32 instead of K); None = full-length scans.
    backend: "auto" (Pallas VMEM kernel on TPU, XLA scans elsewhere),
    "xla", or "pallas".
    apr0: optional decoder-1 a-priori state [B, K] from a previous call —
    WARM START: `turbo_decode(x, k, m, apr0=s)` after `..., n, return_state
    =True` equals a single (n+m)-iteration decode (the reference's
    early-stopping decoder keeps iterating the same state, tdec run_all).
    return_state: also return the apr state for later resumption.
    """
    import jax.numpy as jnp

    if window == 0:
        window = default_window(k) if k >= 256 else None
    use_pallas = backend == "pallas" or (backend == "auto" and _pallas_ok())

    def siso(sa, pr, tx, tz):
        if window:
            if use_pallas:
                from ...ops.tdec_pallas import siso_windowed_pallas

                return siso_windowed_pallas(sa, pr, tx, tz, L=window, T=32,
                                            dtype=siso_dtype())
            return _siso_windowed(sa, pr, tx, tz, L=window, T=32)
        return _siso(sa, pr, tx, tz)

    d = k + 4
    d0, d1, d2 = dcat_llr[..., :d], dcat_llr[..., d : 2 * d], dcat_llr[..., 2 * d :]
    sys, par1, par2 = d0[..., :k], d1[..., :k], d2[..., :k]
    # tail re-arrangement (36.212 §5.1.3.2.2): see turbo.turbo_encode_np
    t1x = jnp.stack([d0[..., k], d2[..., k], d1[..., k + 1]], axis=-1)
    t1z = jnp.stack([d1[..., k], d0[..., k + 1], d2[..., k + 1]], axis=-1)
    t2x = jnp.stack([d0[..., k + 2], d2[..., k + 2], d1[..., k + 3]], axis=-1)
    t2z = jnp.stack([d1[..., k + 2], d0[..., k + 3], d2[..., k + 3]], axis=-1)

    pi = jnp.asarray(qpp_perm(k))
    pi_inv = jnp.asarray(qpp_perm_inv(k))

    import os as _os
    if (use_pallas and window and sys.ndim == 2
            and _os.environ.get('SRSLTE_TPU_SISO_CACHE', '1') != '0'):
        # Resumable-state path: parity windows, SYSTEMATIC windows (roll-
        # built, no gather) and tail-beta inits are prepared once and both
        # SISOs emit extrinsics, so the whole inter-SISO algebra per
        # iteration is two composed window gathers (perms pi_inv and pi) +
        # window-domain adds — no standalone [B, K] interleave pass at all.
        # Everything runs in siso_dtype() (bf16 on TPU; fixed-point
        # discipline per _BF16_TARGET/_BF16_CLIP, cf. tdec_iteration_8).
        st = turbo_start(dcat_llr, k, L=window, T=32)
        if apr0 is not None:
            st = st._replace(
                ext2=(apr0 * st.sc)[..., pi].astype(st.sys_d.dtype))
        st = turbo_step(st, k, n_iter, L=window, T=32, first=apr0 is None)
        hard, post, apr1 = turbo_hard(st, k)
        if return_state:
            return hard, post, apr1
        return hard, post
    else:
        siso1 = lambda sa: siso(sa, par1, t1x, t1z)
        siso2 = lambda sa: siso(sa, par2, t2x, t2z)

    apr1 = jnp.zeros_like(sys) if apr0 is None else apr0
    post = sys
    for _ in range(n_iter):
        llr1 = siso1(sys + apr1)
        ext1 = llr1 - sys - apr1
        in2 = (sys + ext1)[..., pi]
        llr2 = siso2(in2)
        ext2 = llr2 - in2
        apr1 = ext2[..., pi_inv]
        # llr2 deinterleaved = sys + ext1 + ext2: the full posterior
        post = llr2[..., pi_inv]
    hard = (post > 0).astype(jnp.uint8)
    if return_state:
        return hard, post, apr1
    return hard, post

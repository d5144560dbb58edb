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


def turbo_decode(dcat_llr, k: int, n_iter: int = 5):
    """Decode a batch: dcat_llr [B, 3*(K+4)] -> (hard bits [B, K] uint8, llr [B, K]).

    dcat layout per turbo.turbo_encode_np.  Jittable; static (k, n_iter).
    """
    import jax.numpy as jnp

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

    apr1 = jnp.zeros_like(sys)
    post = sys
    for _ in range(n_iter):
        llr1 = _siso(sys + apr1, par1, t1x, t1z)
        ext1 = llr1 - sys - apr1
        in2 = (sys + ext1)[..., pi]
        llr2 = _siso(in2, par2, t2x, t2z)
        ext2 = llr2 - in2
        apr1 = ext2[..., pi_inv]
        # llr2 deinterleaved = sys + ext1 + ext2: the full posterior
        post = llr2[..., pi_inv]
    hard = (post > 0).astype(jnp.uint8)
    return hard, post

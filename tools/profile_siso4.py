"""Attribute per-iteration glue cost: clips vs perm gathers vs unpack."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("NB", str(11 * 384)))
K = int(os.getenv("K_", "5824"))
L, T = 128, 32
N_IN = 8
REPS = 3


def timeit(name, fn, *args):
    out = float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = float(np.asarray(fn(*args)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:52s} {dt*1e3:9.2f} ms tot {dt*1e3/N_IN:7.2f} ms/rep",
          flush=True)
    return dt


def main():
    from srslte_tpu.ops.tdec_pallas import (prepare_beta_init,
                                            prepare_windows,
                                            siso_from_windows)
    from srslte_tpu.phy.fec.tdec import siso_dtype
    from srslte_tpu.phy.fec.turbo import qpp_perm, qpp_perm_inv

    dt_ = siso_dtype()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, K), jnp.float32) * 4
    tail = jax.random.normal(key, (B, 3), jnp.float32)
    pi = jnp.asarray(qpp_perm(K))
    pi_inv = jnp.asarray(qpp_perm_inv(K))

    sa_w = prepare_windows(x, K, L, T, dtype=dt_)
    pr_w = prepare_windows(x * 0.7, K, L, T, dtype=dt_)
    b0 = prepare_beta_init(tail, tail, B, K, L, T, dtype=dt_)
    xd = x.astype(dt_)

    def loop(body, *xs):
        @jax.jit
        def f(*xs):
            def b(i, acc):
                return body(acc, *xs)
            return jax.lax.fori_loop(
                0, N_IN, b, jnp.zeros_like(xd))[:2, :2].astype(jnp.float32).sum()
        return f

    # (d) two kernels back to back, no prep
    def two_kernels(acc, sa_w, pr_w, b0):
        e1 = siso_from_windows(sa_w, pr_w, b0, B, K, L, T, emit_ext=True)
        e2 = siso_from_windows(sa_w, pr_w, b0, B, K, L, T, emit_ext=True)
        return e1 + e2 + acc * 0.5

    timeit("2 kernels, no prep", loop(two_kernels), sa_w, pr_w, b0)

    # (a) full iteration, no sat
    def iter_nosat(acc, xd, sa_w, pr_w, b0):
        w1 = sa_w + prepare_windows(acc, K, L, T, perm=pi_inv, dtype=dt_)
        e1 = siso_from_windows(w1, pr_w, b0, B, K, L, T, emit_ext=True)
        w2 = prepare_windows(xd + e1, K, L, T, perm=pi, dtype=dt_)
        return siso_from_windows(w2, pr_w, b0, B, K, L, T, emit_ext=True)

    timeit("iteration, no sat", loop(iter_nosat), xd, sa_w, pr_w, b0)

    # (b) full iteration with sat
    sat = lambda v: jnp.clip(v, -32.0, 32.0)

    def iter_sat(acc, xd, sa_w, pr_w, b0):
        w1 = sat(sa_w + prepare_windows(acc, K, L, T, perm=pi_inv, dtype=dt_))
        e1 = siso_from_windows(w1, pr_w, b0, B, K, L, T, emit_ext=True)
        w2 = prepare_windows(sat(xd + e1), K, L, T, perm=pi, dtype=dt_)
        return siso_from_windows(w2, pr_w, b0, B, K, L, T, emit_ext=True)

    timeit("iteration, sat", loop(iter_sat), xd, sa_w, pr_w, b0)

    # (c) iteration with unpermuted gathers (same gather shape, id perm)
    ident = jnp.arange(K, dtype=jnp.int32)

    def iter_ident(acc, xd, sa_w, pr_w, b0):
        w1 = sa_w + prepare_windows(acc, K, L, T, perm=ident, dtype=dt_)
        e1 = siso_from_windows(w1, pr_w, b0, B, K, L, T, emit_ext=True)
        w2 = prepare_windows(xd + e1, K, L, T, perm=ident, dtype=dt_)
        return siso_from_windows(w2, pr_w, b0, B, K, L, T, emit_ext=True)

    timeit("iteration, identity perm", loop(iter_ident), xd, sa_w, pr_w, b0)

    # (e) just the two preps (no kernels)
    def preps_only(acc, xd):
        a = prepare_windows(acc, K, L, T, perm=pi_inv, dtype=dt_)
        bw = prepare_windows(xd + acc, K, L, T, perm=pi, dtype=dt_)
        return acc * 0.5 + a[:L, :, 0, :K // 128 * 0 + 1].reshape(
            L, -1)[:, :1] * 0 + bw[0, 0, 0, 0] + acc

    @jax.jit
    def preps(xd):
        def b(i, acc):
            a = prepare_windows(acc, K, L, T, perm=pi_inv, dtype=dt_)
            bw = prepare_windows(xd + acc, K, L, T, perm=pi, dtype=dt_)
            # consume both so neither is DCE'd; produce [B, K] again
            n = a.shape[1] * a.shape[2] * a.shape[3]
            v = (a[T] + bw[T]).reshape(n)[: B * (K // L + 1)]
            return acc * 0.5 + v[: K][None, :] * 0 + acc * 0.5 + v[0]
        return jax.lax.fori_loop(
            0, N_IN, b, jnp.zeros_like(xd))[:2, :2].astype(jnp.float32).sum()

    timeit("2 perm preps only", preps, xd)


if __name__ == "__main__":
    main()

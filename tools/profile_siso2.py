"""SISO pipeline marginal costs, measured with in-jit repetition loops."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("NB", str(11 * 384)))
K = int(os.environ.get("K", "5824"))
L = int(os.environ.get("L", "128"))
T = int(os.environ.get("T", "32"))
N_IN = 8  # in-jit repetitions
REPS = 3


def timeit(name, fn, *args):
    out = float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = float(np.asarray(fn(*args)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms total, {dt*1e3/N_IN:7.2f} ms/rep")
    return dt


def main():
    from srslte_tpu.ops.tdec_pallas import (prepare_beta_init,
                                            prepare_windows,
                                            siso_from_windows)
    from srslte_tpu.phy.fec.tdec import siso_dtype
    from srslte_tpu.phy.fec.turbo import qpp_perm, qpp_perm_inv

    dt_ = siso_dtype()
    print(f"B={B} K={K} L={L} T={T} dtype={dt_.__name__} inner={N_IN}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, K), jnp.float32) * 4
    tail = jax.random.normal(key, (B, 3), jnp.float32)
    pi = jnp.asarray(qpp_perm(K))
    pi_inv = jnp.asarray(qpp_perm_inv(K))

    sa_w = prepare_windows(x, K, L, T, dtype=dt_)
    pr_w = prepare_windows(x * 0.7, K, L, T, dtype=dt_)
    b0 = prepare_beta_init(tail, tail, B, K, L, T, dtype=dt_)
    xd = x.astype(dt_)

    @jax.jit
    def kernel_only(sa_w, pr_w, b0):
        def body(i, acc):
            e = siso_from_windows(sa_w + acc[1] * 0, pr_w, b0, B, K, L, T,
                                  emit_ext=True)
            return acc[0] + jnp.sum(e[:, :2].astype(jnp.float32)), e[0, 0]
        return jax.lax.fori_loop(0, N_IN, body,
                                 (jnp.float32(0), jnp.asarray(0, dt_)))[0]

    @jax.jit
    def prep_only(xd):
        def body(i, acc):
            w = prepare_windows(xd + acc[1] * 0, K, L, T, perm=pi, dtype=dt_)
            return acc[0] + jnp.sum(w[0, :, 0, :2].astype(jnp.float32)), w[0, 0, 0, 0]
        return jax.lax.fori_loop(0, N_IN, body,
                                 (jnp.float32(0), jnp.asarray(0, dt_)))[0]

    @jax.jit
    def prep_plus_kernel(xd, pr_w, b0):
        def body(i, acc):
            w = prepare_windows(xd + acc[1] * 0, K, L, T, perm=pi, dtype=dt_)
            e = siso_from_windows(w, pr_w, b0, B, K, L, T, emit_ext=True)
            return acc[0] + jnp.sum(e[:, :2].astype(jnp.float32)), e[0, 0]
        return jax.lax.fori_loop(0, N_IN, body,
                                 (jnp.float32(0), jnp.asarray(0, dt_)))[0]

    @jax.jit
    def full_iteration(xd, sa_w, pr_w, b0):
        # one turbo iteration as in the cached tdec path
        def body(i, acc):
            ext2 = acc[1]
            w1 = sa_w + prepare_windows(ext2, K, L, T, perm=pi_inv, dtype=dt_)
            e1 = siso_from_windows(w1, pr_w, b0, B, K, L, T, emit_ext=True)
            w2 = prepare_windows(xd + e1, K, L, T, perm=pi, dtype=dt_)
            ext2n = siso_from_windows(w2, pr_w, b0, B, K, L, T, emit_ext=True)
            return acc[0] + jnp.sum(ext2n[:, :2].astype(jnp.float32)), ext2n
        return jax.lax.fori_loop(
            0, N_IN, body, (jnp.float32(0), jnp.zeros_like(xd)))[0]

    timeit("baseline (empty-ish loop)", jax.jit(
        lambda x: jax.lax.fori_loop(0, N_IN, lambda i, a: a + jnp.sum(x[:2, :2]),
                                    jnp.float32(0))), xd)
    timeit(f"kernel only x{N_IN}", kernel_only, sa_w, pr_w, b0)
    timeit(f"perm prep only x{N_IN}", prep_only, xd)
    timeit(f"perm prep + kernel x{N_IN}", prep_plus_kernel, xd, pr_w, b0)
    timeit(f"full turbo iteration x{N_IN}", full_iteration, xd, sa_w, pr_w, b0)


if __name__ == "__main__":
    main()

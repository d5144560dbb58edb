"""Accurate per-op device timing: run an op N times inside ONE jit with a
data dependency chain; marginal time = (t(N2) - t(N1)) / (N2 - N1).
Relay/dispatch overhead cancels."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def marginal(make_loop, n1=2, n2=12, reps=5):
    f1, f2 = jax.jit(make_loop(n1)), jax.jit(make_loop(n2))
    jax.block_until_ready(f1())
    jax.block_until_ready(f2())
    def t(f):
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(f())
        return (time.perf_counter() - t0) / reps
    return (t(f2) - t(f1)) / (n2 - n1)


def main():
    from srslte_tpu.phy.fec.turbo import qpp_perm
    from srslte_tpu.phy.fec import crc as crcmod
    from srslte_tpu.ops.tdec_pallas import (prepare_windows,
                                            prepare_windows_roll,
                                            prepare_beta_init,
                                            siso_from_windows)

    Ng, K = 4992, 5824
    pi = jnp.asarray(qpp_perm(K))
    key = jax.random.PRNGKey(0)

    def loop_op(op, shape, n):
        def f():
            x = jax.random.normal(key, shape, jnp.float32)
            def body(i, x):
                return op(x) * (1.0 + 1e-9 * i)
            return jax.lax.fori_loop(0, n, body, x).sum()
        return f

    def m(op, shape, name):
        v = marginal(lambda n: loop_op(op, shape, n))
        print(f"{name}: {v*1e3:.3f} ms")

    m(lambda x: x[:, pi], (Ng, K), "perm gather [Ng,K]")
    m(lambda x: x * 1.0001 + 1.0, (Ng, K), "elementwise 116MB")
    m(lambda x: x.T.reshape(x.shape), (Ng, K), "transpose 116MB")

    gf = jnp.asarray(crcmod.crc_matrix(K - 24, 0x1800063, 24), jnp.float32)
    def crc_op(x):
        r = jnp.matmul(x[:, :K - 24], gf)
        return x * (1.0 + 1e-12 * r.sum())
    m(crc_op, (Ng, K), "crc f32 matmul (sliced K-24)")

    # prepare_windows / siso on window shapes
    W = -(-K // 128)
    def pw_op(x):
        w = prepare_windows(x, K, 128, 32, perm=pi)
        return x * (1.0 + 1e-12 * w.sum())
    m(pw_op, (Ng, K), "prepare_windows perm")
    def pwnp_op(x):
        w = prepare_windows(x, K, 128, 32)
        return x * (1.0 + 1e-12 * w.sum())
    m(pwnp_op, (Ng, K), "prepare_windows no-perm")
    def pwr_op(x):
        w = prepare_windows_roll(x, K, 128, 32)
        return x * (1.0 + 1e-12 * w.sum())
    m(pwr_op, (Ng, K), "prepare_windows_roll")

    # siso: chain via scaling the window tensor
    x0 = jax.random.normal(key, (Ng, K), jnp.float32)
    sa_w = prepare_windows(x0, K, 128, 32)
    pr_w = prepare_windows(x0, K, 128, 32)
    tails = jnp.zeros((Ng, 3), jnp.float32)
    b0 = prepare_beta_init(tails, tails, Ng, K, 128, 32)
    def loop_siso(n):
        def f():
            def body(i, carry):
                sw = sa_w * (1.0 + 1e-9 * i)
                e = siso_from_windows(sw, pr_w, b0, Ng, K, 128, 32,
                                      emit_ext=True)
                return carry + e.sum()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0))
        return f
    print(f"siso_from_windows: {marginal(loop_siso)*1e3:.3f} ms")


if __name__ == "__main__":
    main()

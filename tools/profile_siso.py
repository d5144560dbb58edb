"""Micro-profile of the turbo SISO pipeline: kernel vs window-prep glue."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("NB", str(11 * 384)))  # code blocks
K = int(os.environ.get("K", "5824"))
L, T = 128, 32
REPS = 6


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    return float(np.asarray(jnp.sum(leaves[0].astype(jnp.float32))))


def timeit(name, fn, *args):
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        _force(fn(*args))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    from srslte_tpu.ops.tdec_pallas import (prepare_beta_init,
                                            prepare_windows,
                                            prepare_windows_roll,
                                            siso_from_windows)
    from srslte_tpu.phy.fec.tdec import siso_dtype, turbo_decode
    from srslte_tpu.phy.fec.turbo import qpp_perm

    dt = siso_dtype()
    print(f"B={B} K={K} dtype={dt.__name__}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, K), jnp.float32) * 4
    tail = jax.random.normal(key, (B, 3), jnp.float32)
    pi = jnp.asarray(qpp_perm(K))

    W = -(-K // L)
    print(f"windows/CB={W} total={B*W}")

    _, t_roll = timeit("prepare_windows_roll",
                       jax.jit(lambda x: prepare_windows_roll(x, K, L, T, dtype=dt)), x)
    _, t_gat = timeit("prepare_windows (gather)",
                      jax.jit(lambda x: prepare_windows(x, K, L, T, dtype=dt)), x)
    pw = jax.jit(lambda x, p: prepare_windows(x, K, L, T, perm=p, dtype=dt))
    _, t_perm = timeit("prepare_windows (perm gather)", pw, x, pi)

    sa_w = jax.block_until_ready(prepare_windows(x, K, L, T, dtype=dt))
    pr_w = jax.block_until_ready(prepare_windows(x, K, L, T, dtype=dt))
    b0 = jax.block_until_ready(prepare_beta_init(tail, tail, B, K, L, T, dtype=dt))

    kern = jax.jit(lambda s, p, b: siso_from_windows(s, p, b, B, K, L, T,
                                                     emit_ext=True))
    _, t_kern = timeit("siso_from_windows (kernel+unpack)", kern, sa_w, pr_w, b0)

    # full turbo iterations for reference
    d = K + 4
    dcat = jax.random.normal(key, (B, 3 * d), jnp.float32) * 4
    for n in (1, 2, 5):
        timeit(f"turbo_decode n_iter={n}",
               jax.jit(lambda c, n=n: turbo_decode(c, K, n_iter=n)[0]), dcat)

    lt = L + 2 * T
    n_win = B * W
    print(f"\nper-SISO ideal: windows*steps = {n_win*(L+T+T)/1e6:.1f}M pos")
    print(f"kernel ms/SISO: {t_kern*1e3:.2f}")


if __name__ == "__main__":
    main()

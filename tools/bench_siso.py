"""Microbenchmark the Pallas SISO kernel and the full turbo decode on TPU.

Usage: python tools/bench_siso.py [reps]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, args, reps=8, label=""):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0][..., :1], np.float32) \
        if False else None
    # sync via float32 reduction transfer
    s = jax.jit(lambda o: jnp.sum(o[0] if isinstance(o, tuple) else o)
                .astype(jnp.float32))
    _ = np.asarray(s(out))
    t0 = time.perf_counter()
    res = [fn(*args) for _ in range(reps)]
    outs = [np.asarray(s(r)) for r in res]
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms/call")
    return dt


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from srslte_tpu.ops.tdec_pallas import siso_windowed_pallas

    B, K = 4224, 6144
    key = jax.random.PRNGKey(0)
    sa = jax.random.normal(key, (B, K), jnp.float32)
    par = jax.random.normal(key, (B, K), jnp.float32)
    tx = jnp.zeros((B, 3), jnp.float32)
    tz = jnp.zeros((B, 3), jnp.float32)

    f = jax.jit(lambda a, p, x, z: siso_windowed_pallas(a, p, x, z))
    dt = timeit(f, (sa, par, tx, tz), reps, f"siso_pallas B={B} K={K}")
    nwin = B * (K // 128)
    print(f"  windows: {nwin}, {nwin*160/dt/1e9:.1f} Gwindow-steps/s, "
          f"{B*K/dt/1e6:.0f} Mbit/s per SISO pass")


if __name__ == "__main__":
    main()

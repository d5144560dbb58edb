"""Decompose the honest-bench chain's device time per stage.

Each stage runs M times INSIDE one jit (fori_loop with a data dependency so
iterations can't be CSE'd or elided); per-application device time is the
slope between M=lo and M=hi, which cancels the ~30 ms axon relay RTT.

Usage: python tools/profile_chain.py [stage ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

B_SF = 384
B_CB = 4224
K_CB = 5824


def slope(make_fn, lo=1, hi=5, reps=4, label=""):
    ts = {}
    for m in (lo, hi):
        f = make_fn(m)
        r = float(np.asarray(f()))  # compile+run
        t0 = time.perf_counter()
        outs = [f() for _ in range(reps)]
        _ = [np.asarray(o) for o in outs]
        ts[m] = (time.perf_counter() - t0) / reps
    per = (ts[hi] - ts[lo]) / (hi - lo)
    print(f"{label}: {per*1e3:.2f} ms/application "
          f"(M={lo}: {ts[lo]*1e3:.1f} ms, M={hi}: {ts[hi]*1e3:.1f} ms)",
          flush=True)
    return per


def main():
    want = set(sys.argv[1:])

    def sel(name):
        return not want or name in want

    import bench as bench_mod
    from srslte_tpu.phy.fec.tdec import turbo_decode
    from srslte_tpu.phy.fec.turbo import qpp_perm
    from srslte_tpu.ops.tdec_pallas import siso_windowed_pallas

    key = jax.random.PRNGKey(3)

    if sel("chain"):
        cell, step = bench_mod.build_step()
        snr = jnp.float32(10 ** 1.6)

        def make(m):
            keys = jax.random.split(key, m)

            @jax.jit
            def f():
                def body(i, acc):
                    ok, dci, cfi = step(keys[i], snr + acc * 0)
                    return acc + ok + dci + cfi
                return jax.lax.fori_loop(0, m, body, jnp.float32(0))
            return f
        slope(make, label="full chain step (384 sf)")

    if sel("siso"):
        sa = jax.random.normal(key, (B_CB, K_CB), jnp.float32)
        pr = jax.random.normal(key, (B_CB, K_CB), jnp.float32)
        tx = jnp.zeros((B_CB, 3)); tz = jnp.zeros((B_CB, 3))

        def make(m):
            @jax.jit
            def f():
                def body(i, acc):
                    out = siso_windowed_pallas(sa + acc * 0, pr, tx, tz)
                    return acc + out[0, 0]
                return jax.lax.fori_loop(0, m, body, jnp.float32(0))
            return f
        slope(make, label=f"siso pass ({B_CB}x{K_CB})")

    if sel("turbo1"):
        llr = jax.random.normal(key, (B_CB, 3 * (K_CB + 4)), jnp.float32)

        def make(m):
            @jax.jit
            def f():
                def body(i, acc):
                    _, post = turbo_decode(llr + acc * 0, K_CB, n_iter=1)
                    return acc + post[0, 0]
                return jax.lax.fori_loop(0, m, body, jnp.float32(0))
            return f
        slope(make, label="turbo decode 1 iter")

    if sel("gather"):
        x = jax.random.normal(key, (B_CB, K_CB), jnp.float32)
        pi = jnp.asarray(qpp_perm(K_CB))

        def make(m):
            @jax.jit
            def f():
                def body(i, acc):
                    return acc + (x + acc * 0)[:, pi][0, 0]
                return jax.lax.fori_loop(0, m, body, jnp.float32(0))
            return f
        slope(make, label="QPP gather [B,K]")

    if sel("noise"):
        def make(m):
            @jax.jit
            def f():
                def body(i, acc):
                    n = jax.random.normal(jax.random.fold_in(key, i),
                                          (2, B_SF, 30720), jnp.float32)
                    return acc + n[0, 0, 0]
                return jax.lax.fori_loop(0, m, body, jnp.float32(0))
            return f
        slope(make, label="AWGN gen (384 sf)")


if __name__ == "__main__":
    main()

"""Marginal costs of turbo_start / turbo_step / turbo_hard on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("NB", str(11 * 384)))
K = int(os.environ.get("K", "5824"))
N_IN = 8
REPS = 3


def timeit(name, fn, *args):
    out = float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = float(np.asarray(fn(*args)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms total, {dt*1e3/N_IN:7.2f} ms/rep",
          flush=True)
    return dt


def main():
    from srslte_tpu.phy.fec import tdec

    key = jax.random.PRNGKey(0)
    dcat = jax.random.normal(key, (B, 3 * (K + 4)), jnp.float32) * 4

    def loop(body):
        @jax.jit
        def f(dcat):
            def b(i, acc):
                return acc * 0.5 + body(dcat + acc * 0)
            return jax.lax.fori_loop(0, N_IN, b, jnp.float32(0))
        return f

    t_base = timeit("baseline", loop(lambda d: jnp.sum(d[:2, :2])), dcat)

    def start_only(d):
        st = tdec.turbo_start(d, K)
        return jnp.sum(st.w_sys[0, 0, 0, :2].astype(jnp.float32))

    t_start = timeit("turbo_start", loop(start_only), dcat)

    def start_hard(d):
        st = tdec.turbo_start(d, K)
        h, _, _ = tdec.turbo_hard(st, K)
        return jnp.sum(h[:2, :2].astype(jnp.float32))

    t_sh = timeit("turbo_start + hard", loop(start_hard), dcat)

    def start_1iter(d):
        st = tdec.turbo_step(tdec.turbo_start(d, K), K, 1, first=True)
        return jnp.sum(st.ext2[:2, :2].astype(jnp.float32))

    t_s1 = timeit("turbo_start + 1 iter", loop(start_1iter), dcat)

    def start_1iter_hard(d):
        st = tdec.turbo_step(tdec.turbo_start(d, K), K, 1, first=True)
        h, _, _ = tdec.turbo_hard(st, K)
        return jnp.sum(h[:2, :2].astype(jnp.float32))

    t_s1h = timeit("turbo_start + 1 iter + hard", loop(start_1iter_hard), dcat)

    def start_2iter_hard(d):
        st = tdec.turbo_step(tdec.turbo_start(d, K), K, 2, first=True)
        h, _, _ = tdec.turbo_hard(st, K)
        return jnp.sum(h[:2, :2].astype(jnp.float32))

    t_s2h = timeit("turbo_start + 2 iter + hard", loop(start_2iter_hard), dcat)

    from srslte_tpu.phy.fec import crc as crcmod

    def start_1iter_hard_crc(d):
        st = tdec.turbo_step(tdec.turbo_start(d, K), K, 1, first=True)
        h, _, _ = tdec.turbo_hard(st, K)
        pb, po = crcmod.LTE_CRC24B
        ok = crcmod.crc_ok_device(h, pb, po)
        return jnp.sum(ok.astype(jnp.float32))

    t_s1hc = timeit("start + 1 iter + hard + crc", loop(start_1iter_hard_crc),
                    dcat)

    print()
    print(f"start:          {(t_start-t_base)/N_IN*1e3:7.2f} ms")
    print(f"hard(posterior):{(t_sh-t_start)/N_IN*1e3:7.2f} ms")
    print(f"1 iteration:    {(t_s1-t_start)/N_IN*1e3:7.2f} ms")
    print(f"2nd iteration:  {(t_s2h-t_s1h)/N_IN*1e3:7.2f} ms")
    print(f"crc:            {(t_s1hc-t_s1h)/N_IN*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

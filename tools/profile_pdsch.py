"""PDSCH decode breakdown with the bf16 SISO path (in-jit INNER loop,
prefix differencing: RTT cancels)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 384
INNER = 4


def main():
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.phch.dci import Dci1A
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.fec import crc as crcmod
    from srslte_tpu.phy.fec.tdec import turbo_decode
    from srslte_tpu.phy.phch.dlsch import _derm_clusters, dlsch_decode

    cell = Cell(n_prb=100, id=1, nof_ports=1)
    dci = Dci1A(rb_start=0, l_crb=100, mcs=27)
    grant = dci.grant(100)
    pdsch = Pdsch(cell, grant, 4, cfi=2, rnti=0x46)
    cfg = pdsch.cfg
    o = cell.ofdm
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (BATCH, o.nsymb_sf, o.nof_re, 2), jnp.float32)
    ce = jax.random.normal(key, (BATCH, 1, o.nsymb_sf, o.nof_re, 2), jnp.float32)

    from srslte_tpu.phy.mimo import equalize_zf
    from srslte_tpu.phy.modem.modem import demod_soft
    from srslte_tpu.phy.common.scrambling import scramble_llr

    def front(gr, cer):
        g = jax.lax.complex(gr[..., 0], gr[..., 1])
        c = jax.lax.complex(cer[..., 0], cer[..., 1]) + 2.0
        idx = jnp.asarray(pdsch.re_idx)
        y = g.reshape(g.shape[:-2] + (o.nsymb_sf * o.nof_re,))[..., idx]
        cef = c.reshape(c.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        h = cef[..., 0, idx]
        xhat = equalize_zf(y, h)
        gain = jnp.abs(h) ** 2
        llr = demod_soft(xhat, grant.modulation)
        qm = grant.modulation.bits_per_symbol
        llr = llr * jnp.repeat(gain, qm, axis=-1)
        return scramble_llr(llr, pdsch.cinit)

    def stage(gr, cer, upto):
        llr = front(gr, cer)
        if upto == "llr":
            return jnp.sum(llr)
        clusters = _derm_clusters(llr, cfg)
        if upto == "derm":
            return sum(jnp.sum(w) for _, _, w in clusters)
        acc = jnp.float32(0)
        for K, f0, w in clusters:
            flat = w.reshape((-1, w.shape[-1]))
            if upto in ("t1", "t2", "t1crc"):
                n = 1 if upto in ("t1", "t1crc") else 2
                hard, _ = turbo_decode(flat, K, n_iter=n)
                if upto == "t1crc":
                    pb, po = crcmod.LTE_CRC24B
                    acc = acc + jnp.sum(crcmod.crc_ok_device(hard, pb, po))
                else:
                    acc = acc + jnp.sum(hard.astype(jnp.float32))
        return acc

    def loop(upto):
        def f(gr, cer, s):
            def body(i, a):
                return a + stage(gr * (s + 1e-9 * i), cer, upto)
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))
        return jax.jit(f)

    def full(gr, cer, s):
        def body(i, a):
            _, ok = pdsch.decode(
                jax.lax.complex(gr[..., 0], gr[..., 1]) * (s + 1e-9 * i),
                jax.lax.complex(cer[..., 0], cer[..., 1]) + 2.0,
                jnp.float32(0.01))
            return a + ok.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))

    def timed(f, reps=5):
        float(np.asarray(f(grid, ce, jnp.float32(1.0))))
        t0 = time.perf_counter()
        rs = [f(grid, ce, jnp.float32(1.0 + 1e-6 * (i + 1)))
              for i in range(reps)]
        _ = [float(np.asarray(r)) for r in rs]
        return (time.perf_counter() - t0) / reps / INNER

    prev = 0.0
    for st in ("llr", "derm", "t1", "t1crc", "t2"):
        t = timed(loop(st))
        print(f"upto {st}: {t*1e3:.2f} ms (stage {(t-prev)*1e3:+.2f})", flush=True)
        prev = t
    t = timed(jax.jit(full))
    print(f"full cascade decode: {t*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

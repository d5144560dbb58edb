"""PDSCH-decode sub-stage decomposition (prefix differencing)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

BATCH = 384


def timed(f, args, reps=6):
    r = np.asarray(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(reps)]
    _ = [np.asarray(o) for o in outs]
    return (time.perf_counter() - t0) / reps


def main():
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.phch.dci import Dci1A
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.fec import crc as crcmod
    from srslte_tpu.phy.fec import turbo
    from srslte_tpu.phy.fec.tdec import turbo_decode
    from srslte_tpu.phy.mimo import equalize_zf
    from srslte_tpu.phy.modem.modem import demod_soft
    from srslte_tpu.phy.common.scrambling import scramble_llr

    cell = Cell(n_prb=100, id=1, nof_ports=1)
    dci = Dci1A(rb_start=0, l_crb=100, mcs=27)
    grant = dci.grant(100)
    pdsch = Pdsch(cell, grant, 4, cfi=2, rnti=0x46)
    cfg = pdsch.cfg
    print("groups:", [(g.count, g.K, g.E, g.F) for g in cfg.groups],
          flush=True)
    o = cell.ofdm
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (BATCH, o.nsymb_sf, o.nof_re, 2)) \
        .astype(jnp.float32)
    ce = jax.random.normal(key, (BATCH, 1, o.nsymb_sf, o.nof_re, 2)) \
        .astype(jnp.float32)

    def stage(gr, cer, upto):
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
        llr = scramble_llr(llr, pdsch.cinit)
        if upto == "llr":
            return jnp.sum(llr)
        acc = jnp.float32(0)
        pos = 0
        ws = []
        for grp in cfg.groups:
            block = llr[..., pos : pos + grp.count * grp.E]
            pos += grp.count * grp.E
            e = block.reshape((BATCH, grp.count, grp.E))
            w = turbo.rm_rx(e, grp.K, rv=cfg.rv, f=grp.F)
            ws.append((grp, w.reshape((-1, w.shape[-1]))))
            acc = acc + jnp.sum(w)
        if upto == "derm":
            return acc
        acc = jnp.float32(0)
        for grp, flat in ws:
            hard, _ = turbo_decode(flat, grp.K, n_iter=1)
            pb, po = crcmod.LTE_CRC24B
            ok = crcmod.crc_ok_device(hard, pb, po)
            acc = acc + jnp.sum(ok)
        if upto == "ph1":
            return acc
        return acc

    ts = {}
    for st in ("llr", "derm", "ph1"):
        f = jax.jit(lambda a, b, st=st: stage(a, b, st))
        ts[st] = timed(f, (grid, ce))
        print(f"upto {st}: {ts[st]*1e3:.1f} ms", flush=True)
    f_full = jax.jit(
        lambda a, b: pdsch.decode(
            jax.lax.complex(a[..., 0], a[..., 1]),
            jax.lax.complex(b[..., 0], b[..., 1]) + 2.0,
            jnp.float32(0.01))[1].sum())
    ts["full"] = timed(f_full, (grid, ce))
    print(f"full decode: {ts['full']*1e3:.1f} ms", flush=True)
    print(f"derm cost: {(ts['derm']-ts['llr'])*1e3:.1f} ms", flush=True)
    print(f"turbo ph1+crc: {(ts['ph1']-ts['derm'])*1e3:.1f} ms", flush=True)
    print(f"rest (ph2+assembly): {(ts['full']-ts['ph1'])*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()

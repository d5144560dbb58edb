"""PDSCH-internal stage timing (differencing, inner-looped)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "384"))
INNER = int(os.environ.get("BENCH_INNER", "8"))
SNR_DB = 16.0
CFI = 2
RNTI = 0x46


def main():
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.common.scrambling import scramble_llr
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.mimo import equalize_zf
    from srslte_tpu.phy.modem.modem import demod_soft
    from srslte_tpu.phy.phch.dci import Dci1A
    from srslte_tpu.phy.phch import dlsch as dlschmod
    from srslte_tpu.phy.phch.dlsch import dlsch_decode
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.fec import crc as crcmod
    from srslte_tpu.phy.fec.tdec import turbo_decode
    from srslte_tpu.phy.ue.ue_dl import UeDl

    sf_idx = 4
    cell = Cell(n_prb=100, id=1, nof_ports=1)
    dci = Dci1A(rb_start=0, l_crb=100, mcs=27)
    grant = dci.grant(100)
    pdsch = Pdsch(cell, grant, sf_idx, cfi=CFI, rnti=RNTI)
    enb = EnbDl(cell)
    ue = UeDl(cell)
    tbs = grant.tbs
    cfg = pdsch.cfg
    print("tbs", tbs, "C", cfg.seg.C, "groups", cfg.groups)

    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_inputs(key):
        nbytes = -(-tbs // 8)
        words = jax.random.bits(key, (BATCH, nbytes), jnp.uint8)
        bits = ((words[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
        bits = bits.reshape(BATCH, nbytes * 8)[:, :tbs]
        g = enb.put_base(enb.empty_grids((BATCH,)), sf_idx)
        g = enb.put_pdsch(g, pdsch, bits)
        s = enb.gen_signal(g)[..., 0, :]
        snr_lin = 10.0 ** (SNR_DB / 10.0)
        p_sig = jnp.mean(jnp.abs(s) ** 2)
        sigma = jnp.sqrt(p_sig / snr_lin / 2.0)
        nre, nim = jax.random.normal(key, (2,) + s.shape, jnp.float32) * sigma
        rx = s + jax.lax.complex(nre, nim)
        grid, ce, info = ue.fft_estimate(rx, sf_idx)
        return grid, ce, info["noise"]

    grid, ce, noise = [jax.block_until_ready(x) for x in make_inputs(key)]

    o = cell.ofdm
    idx = jnp.asarray(pdsch.re_idx)

    def llr_of(grid, ce, noise):
        y = grid.reshape(grid.shape[:-2] + (o.nsymb_sf * o.nof_re,))[..., idx]
        cef = ce.reshape(ce.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        nv = jnp.asarray(noise)
        if nv.ndim:
            nv = nv[..., None]
        h = cef[..., 0, idx]
        xhat = equalize_zf(y, h)
        gain = jnp.abs(h) ** 2
        w = gain / jnp.maximum(nv, 1e-9)
        llr = demod_soft(xhat, grant.modulation)
        qm = grant.modulation.bits_per_symbol
        llr = llr * jnp.repeat(w, qm, axis=-1)
        return scramble_llr(llr, pdsch.cinit)

    def stage(upto):
        def f(key, grid, ce, noise):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                # tiny perturbation so XLA can't CSE across iterations
                g2 = grid + jax.random.normal(k, (1,), jnp.float32)[0] * 1e-8
                llr = llr_of(g2, ce, noise)
                if upto == "llr":
                    return acc + jnp.sum(llr[..., :8])
                if upto == "derm":
                    ws = dlschmod._derm_clusters(llr, cfg)
                    return acc + sum(jnp.sum(w[..., :4]) for _, _, w in ws)
                if upto == "turbo1":
                    out = 0.0
                    for K, f0, w in dlschmod._derm_clusters(llr, cfg):
                        flat = w.reshape((-1, w.shape[-1]))
                        hard, _ = turbo_decode(flat, K, n_iter=1)
                        out = out + jnp.sum(hard.astype(jnp.float32)[..., :4])
                    return acc + out
                if upto == "turbo1crc":
                    out = 0.0
                    for K, f0, w in dlschmod._derm_clusters(llr, cfg):
                        flat = w.reshape((-1, w.shape[-1]))
                        hard, _ = turbo_decode(flat, K, n_iter=1)
                        pb, po = crcmod.LTE_CRC24B
                        ok = crcmod.crc_ok_device(hard, pb, po)
                        out = out + jnp.sum(ok.astype(jnp.float32))
                    return acc + out
                bits, ok = dlsch_decode(llr, cfg, n_iter=5)
                return acc + ok.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))
        return jax.jit(f)

    variants = os.environ.get("STAGES", "llr,derm,turbo1,turbo1crc,full").split(",")
    times = {}
    for upto in variants:
        fn = stage(upto)
        jax.block_until_ready(fn(key, grid, ce, noise))
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            jax.block_until_ready(fn(jax.random.fold_in(key, 50 + r), grid,
                                     ce, noise))
        dt = (time.perf_counter() - t0) / reps
        times[upto] = dt
        print(f"upto {upto:10s}: {dt*1e3:9.2f} ms / {INNER}x{BATCH} sf",
              flush=True)

    prev = 0.0
    print("\ndeltas:")
    for upto in variants:
        print(f"  {upto:10s}: {(times[upto]-prev)*1e3:9.2f} ms")
        prev = times[upto]


if __name__ == "__main__":
    main()

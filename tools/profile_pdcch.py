"""PDCCH blind-search internal stage timing (inner-looped differencing)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "384"))
N_IN = 8
REPS = 3
CFI = 2
RNTI = 0x46


def timeit(name, fn, *args):
    out = float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = float(np.asarray(fn(*args)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:40s} {dt*1e3:9.2f} ms tot {dt*1e3/N_IN:7.2f} ms/rep",
          flush=True)
    return dt


def main():
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.fec.convolutional import rm_conv_rx, viterbi_decode
    from srslte_tpu.phy.fec.crc import LTE_CRC16, crc_ok_device
    from srslte_tpu.phy.phch.dci import format0_1a_size
    from srslte_tpu.phy.phch.pdcch import (Pdcch, common_locations,
                                           ue_locations, rnti_mask)

    sf_idx = 4
    cell = Cell(n_prb=100, id=1, nof_ports=1)
    pd = Pdcch(cell, CFI, sf_idx)
    dci_len = format0_1a_size(100)
    locs = ue_locations(pd.n_cce, RNTI, sf_idx)
    for l in common_locations(pd.n_cce):
        if l not in locs:
            locs.append(l)
    groups = {}
    for l in locs:
        groups.setdefault(l.L, []).append(l)
    groups = tuple(tuple(g) for g in groups.values())
    ncand = len(locs)
    print(f"candidates: {ncand}, dci_len {dci_len}")
    mask = jnp.asarray(rnti_mask(RNTI))

    key = jax.random.PRNGKey(0)
    o = cell.ofdm
    grid = (jax.random.normal(key, (BATCH, o.nsymb_sf, o.nof_re, 2))
            .astype(jnp.float32))
    ce = jax.random.normal(key, (BATCH, 1, o.nsymb_sf, o.nof_re, 2)) * 0.5 + 1

    n_coded = 3 * (dci_len + 16)

    def llr_stage(g1, ce1):
        gc = jax.lax.complex(g1[..., 0], g1[..., 1])
        cec = jax.lax.complex(ce1[..., 0], ce1[..., 1])
        derms = [rm_conv_rx(pd._llrs(gc, cec, list(gr)), n_coded)
                 for gr in groups if gr]
        return jnp.concatenate(derms, axis=0)

    def stage(upto):
        @jax.jit
        def f(grid, ce):
            def body(i, acc):
                g1 = grid[0] + acc * 1e-20
                de_rm = jax.vmap(lambda g, c: llr_stage(g, c))(
                    grid + acc * 1e-20, ce)
                if upto == "llr":
                    return acc + jnp.sum(de_rm[..., :2, :2])
                flat = de_rm.reshape(-1, n_coded)
                bits = viterbi_decode(flat, dci_len + 16)
                if upto == "vit":
                    return acc + jnp.sum(bits[..., :4].astype(jnp.float32))
                ok = crc_ok_device(bits, *LTE_CRC16, rnti_mask=mask)
                return acc + jnp.sum(ok.astype(jnp.float32))
            return jax.lax.fori_loop(0, N_IN, body, jnp.float32(0))
        return f

    t0 = timeit("baseline", jax.jit(
        lambda g, c: jax.lax.fori_loop(
            0, N_IN, lambda i, a: a + jnp.sum(g[:2, 0, :2, 0]),
            jnp.float32(0))), grid, ce)
    t1 = timeit("llr+derm", stage("llr"), grid, ce)
    t2 = timeit("+viterbi", stage("vit"), grid, ce)
    t3 = timeit("+crc", stage("crc"), grid, ce)
    print(f"\nllr: {(t1-t0)/N_IN*1e3:.2f}  viterbi: {(t2-t1)/N_IN*1e3:.2f}  "
          f"crc: {(t3-t2)/N_IN*1e3:.2f} ms/app")


if __name__ == "__main__":
    main()

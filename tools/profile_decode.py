"""Decode-scope stage decomposition for the cc_worker bench.

Times INNER-loop variants that stop after successive stages; adjacent
differences give per-application device cost with the relay RTT cancelled.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import bench as bench_mod  # noqa: E402

BATCH = bench_mod.BATCH
INNER = 4


def main():
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.phch.dci import Dci1A, pack_format1a, format0_1a_size
    from srslte_tpu.phy.phch.pcfich import Pcfich
    from srslte_tpu.phy.phch.pdcch import (Pdcch, Location, common_locations,
                                           ue_locations, rnti_mask)
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.ue.ue_dl import UeDl

    sf_idx, CFI, RNTI = 4, 2, 0x46
    cell = Cell(n_prb=100, id=1, nof_ports=1)
    dci = Dci1A(rb_start=0, l_crb=100, mcs=27)
    grant = dci.grant(100)
    pdsch = Pdsch(cell, grant, sf_idx, cfi=CFI, rnti=RNTI)
    enb = EnbDl(cell)
    ue = UeDl(cell)
    pd = Pdcch(cell, CFI, sf_idx)
    dci_bits = jnp.asarray(pack_format1a(dci, 100))
    dci_len = format0_1a_size(100)
    tx_loc = Location(8, 8)
    locs = ue_locations(pd.n_cce, RNTI, sf_idx)
    for l in common_locations(pd.n_cce):
        if l not in locs:
            locs.append(l)
    groups = {}
    for l in locs:
        groups.setdefault(l.L, []).append(l)
    groups = {L: tuple(g) for L, g in groups.items()}
    mask = jnp.asarray(rnti_mask(RNTI))
    tbs = grant.tbs
    snr = jnp.float32(10 ** 1.6)

    def encode(key):
        nbytes = -(-tbs // 8)
        words = jax.random.bits(key, (BATCH, nbytes), jnp.uint8)
        bits = ((words[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
        bits = bits.reshape(BATCH, nbytes * 8)[:, :tbs]
        g = enb.put_base(enb.empty_grids((BATCH,)), sf_idx)
        g = enb.put_pcfich(g, sf_idx, CFI)
        g = enb.put_pdcch(g, sf_idx, CFI, dci_bits, RNTI, tx_loc)
        g = enb.put_pdsch(g, pdsch, bits)
        s = enb.gen_signal(g)[..., 0, :]
        return jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1)

    def decode(key, s_ri, upto):
        s = jax.lax.complex(s_ri[..., 0], s_ri[..., 1])
        p_sig = jnp.mean(jnp.abs(s) ** 2)
        sigma = jnp.sqrt(p_sig / snr / 2.0)
        nre, nim = jax.random.normal(key, (2,) + s.shape, jnp.float32) * sigma
        rx = s + jax.lax.complex(nre, nim)
        if upto == "awgn":
            return jnp.sum(jnp.abs(jnp.real(rx)))
        grid, ce, info = ue.fft_estimate(rx, sf_idx)
        if upto == "fft":
            return jnp.sum(grid[..., 0] ** 2 if grid.dtype != jnp.complex64
                           else jnp.abs(grid)) if False else jnp.sum(jnp.abs(grid))
        cfi_dec, _ = Pcfich(cell, sf_idx).decode(grid, ce)
        acc = jnp.sum(cfi_dec.astype(jnp.float32))
        if upto == "pcfich":
            return acc

        def search_one(g1, ce1):
            ok, cand = pd._decode_mixed_traced(
                g1, ce1, tuple(groups.values()), dci_len, mask)
            match = jnp.all(cand == dci_bits[None, :], axis=-1)
            return jnp.any(ok & match)

        acc = acc + jnp.sum(jax.vmap(search_one)(grid, ce).astype(jnp.float32))
        if upto == "pdcch":
            return acc
        _, ok = pdsch.decode(grid, ce, info["noise"])
        return acc + ok.sum().astype(jnp.float32)

    def loop(upto):
        def f(key, s_ri):
            def body(i, a):
                return a + decode(jax.random.fold_in(key, i), s_ri, upto)
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))
        return jax.jit(f)

    key = jax.random.PRNGKey(0)
    s_ri = jax.block_until_ready(jax.jit(encode)(key))

    def timed(f, reps=6):
        jax.block_until_ready(f(key, s_ri))
        t0 = time.perf_counter()
        for i in range(reps):
            r = f(jax.random.fold_in(key, 100 + i), s_ri)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps / INNER

    ts = {}
    prev = 0.0
    for st in ("awgn", "fft", "pcfich", "pdcch", "full"):
        ts[st] = timed(loop(st))
        print(f"upto {st}: {ts[st]*1e3:.2f} ms/app (stage: "
              f"{(ts[st]-prev)*1e3:.2f} ms)", flush=True)
        prev = ts[st]
    msps = BATCH * cell.ofdm.sf_len / ts["full"] / 1e6
    print(f"implied: {msps:.1f} Msamples/s", flush=True)


if __name__ == "__main__":
    main()

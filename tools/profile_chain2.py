"""Stage timing by differencing: run the bench decode with stages toggled,
INNER-looped inside one jit so the host-tunnel RTT amortizes.

Stages: fft_estimate -> pcfich -> pdcch -> pdsch.  Each variant includes all
stages up to its name.  Differences between successive variants give per-
stage device time per BATCH subframes.
"""

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
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.phch.dci import Dci1A, pack_format1a, format0_1a_size
    from srslte_tpu.phy.phch.pcfich import Pcfich
    from srslte_tpu.phy.phch.pdcch import (Pdcch, Location, common_locations,
                                           ue_locations, rnti_mask)
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.ue.ue_dl import UeDl

    sf_idx = 4
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

    def decode(key, s_ri, snr_lin, upto):
        s = jax.lax.complex(s_ri[..., 0], s_ri[..., 1])
        p_sig = jnp.mean(jnp.abs(s) ** 2)
        sigma = jnp.sqrt(p_sig / snr_lin / 2.0)
        nre, nim = jax.random.normal(key, (2,) + s.shape, jnp.float32) * sigma
        rx = s + jax.lax.complex(nre, nim)
        acc = jnp.float32(0)
        if upto == "noise":
            return acc + jnp.sum(jnp.abs(rx[:, :8]) ** 2)
        grid, ce, info = ue.fft_estimate(rx, sf_idx)
        acc = acc + jnp.sum(jnp.abs(grid[:, 0, :8]) ** 2) + jnp.sum(info["noise"])
        if upto == "fft":
            return acc
        cfi_dec, _ = Pcfich(cell, sf_idx).decode(grid, ce)
        acc = acc + jnp.sum(cfi_dec.astype(jnp.float32))
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

    def looped(upto):
        def f(key, s_ri, snr_lin):
            def body(i, a):
                return a + decode(jax.random.fold_in(key, i), s_ri, snr_lin,
                                  upto)
            return jax.lax.fori_loop(0, INNER, body, jnp.float32(0))
        return jax.jit(f)

    key = jax.random.PRNGKey(0)
    s_ri = jax.block_until_ready(jax.jit(encode)(key))
    snr = jnp.float32(10.0 ** (SNR_DB / 10.0))

    times = {}
    for upto in ["noise", "fft", "pcfich", "pdcch", "pdsch"]:
        fn = looped(upto)
        jax.block_until_ready(fn(key, s_ri, snr))
        reps = 3
        t0 = time.perf_counter()
        for r in range(reps):
            jax.block_until_ready(fn(jax.random.fold_in(key, 100 + r), s_ri,
                                     snr))
        dt = (time.perf_counter() - t0) / reps
        times[upto] = dt
        print(f"upto {upto:8s}: {dt*1e3:9.2f} ms / {INNER}x{BATCH} sf")

    prev = 0.0
    print("\nstage deltas (per dispatch of %d sf):" % (INNER * BATCH))
    for upto in ["noise", "fft", "pcfich", "pdcch", "pdsch"]:
        print(f"  {upto:8s}: {(times[upto]-prev)*1e3:9.2f} ms")
        prev = times[upto]
    sf_len = cell.ofdm.sf_len
    print(f"\nfull-chain Msps: {INNER*BATCH*sf_len/times['pdsch']/1e6:.1f}")


if __name__ == "__main__":
    main()

"""Chain decomposition by prefix differencing (RTT cancels in differences).

Variants of the honest-bench step that stop after successive stages; the
difference of adjacent timings is that stage's device cost per 384-sf
dispatch.  Also times turbo n_iter=1 vs 5 the same way.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import bench as bench_mod  # noqa: E402

BATCH = bench_mod.BATCH


def timed(f, args, reps=6):
    r = np.asarray(f(*args))
    t0 = time.perf_counter()
    outs = [f(*args) for _ in range(reps)]
    _ = [np.asarray(o) for o in outs]
    return (time.perf_counter() - t0) / reps


def main():
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.phch.dci import Dci1A, pack_format1a, format0_1a_size
    from srslte_tpu.phy.phch.pcfich import Pcfich
    from srslte_tpu.phy.phch.pdcch import (Pdcch, Location, common_locations,
                                           ue_locations, rnti_mask)
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.ue.ue_dl import UeDl
    from srslte_tpu.phy.fec.tdec import turbo_decode

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

    def front(key, upto):
        kb, kn = jax.random.split(key)
        nbytes = -(-tbs // 8)
        words = jax.random.bits(kb, (BATCH, nbytes), jnp.uint8)
        bits = ((words[..., None] >> jnp.arange(8, dtype=jnp.uint8)) & 1)
        bits = bits.reshape(BATCH, nbytes * 8)[:, :tbs]
        g = enb.put_base(enb.empty_grids((BATCH,)), sf_idx)
        g = enb.put_pcfich(g, sf_idx, CFI)
        g = enb.put_pdcch(g, sf_idx, CFI, dci_bits, RNTI, tx_loc)
        g = enb.put_pdsch(g, pdsch, bits)
        s = enb.gen_signal(g)[..., 0, :]
        if upto == "encode":
            return jnp.sum(jnp.abs(s))
        p_sig = jnp.mean(jnp.abs(s) ** 2)
        sigma = jnp.sqrt(p_sig / snr / 2.0)
        nre_, nim = jax.random.normal(kn, (2,) + s.shape, jnp.float32) * sigma
        rx = s + jax.lax.complex(nre_, nim)
        grid, ce, info = ue.fft_estimate(rx, sf_idx)
        if upto == "fft":
            return jnp.sum(jnp.abs(grid)) + jnp.sum(jnp.abs(ce))
        cfi_dec, _ = Pcfich(cell, sf_idx).decode(grid, ce)
        def search_one(g1, ce1):
            found = jnp.zeros((), jnp.bool_)
            for L, group in groups.items():
                ok, cand = pd._decode_candidates_traced(g1, ce1, group,
                                                        dci_len, mask)
                match = jnp.all(cand == dci_bits[None, :], axis=-1)
                found = jnp.logical_or(found, jnp.any(ok & match))
            return found
        dci_ok = jnp.sum(jax.vmap(search_one)(grid, ce).astype(jnp.float32))
        if upto == "pdcch":
            return dci_ok + cfi_dec.sum().astype(jnp.float32)
        if upto == "llr":
            llr, ninfo = pdsch.demod_llr(grid, ce, info["noise"]) \
                if hasattr(pdsch, "demod_llr") else (None, None)
            return jnp.sum(llr)
        _, ok = pdsch.decode(grid, ce, info["noise"])
        return ok.sum().astype(jnp.float32) + dci_ok

    key = jax.random.PRNGKey(0)
    stages = ["encode", "fft", "pdcch", "full"]
    ts = {}
    for st in stages:
        f = jax.jit(lambda k, st=st: front(k, st))
        ts[st] = timed(f, (key,))
        print(f"upto {st}: {ts[st]*1e3:.1f} ms", flush=True)
    print(f"encode+rng: {ts['encode']*1e3:.1f}", flush=True)
    print(f"noise+fft+chest: {(ts['fft']-ts['encode'])*1e3:.1f}", flush=True)
    print(f"pcfich+pdcch: {(ts['pdcch']-ts['fft'])*1e3:.1f}", flush=True)
    print(f"pdsch decode: {(ts['full']-ts['pdcch'])*1e3:.1f}", flush=True)

    # turbo iteration slope
    llr = jax.random.normal(key, (4224, 3 * 5828), jnp.float32)
    t1 = timed(jax.jit(lambda x: turbo_decode(x, 5824, n_iter=1)[1].sum()),
               (llr,))
    t5 = timed(jax.jit(lambda x: turbo_decode(x, 5824, n_iter=5)[1].sum()),
               (llr,))
    print(f"turbo n1: {t1*1e3:.1f} ms, n5: {t5*1e3:.1f} ms, "
          f"per-iter: {(t5-t1)/4*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

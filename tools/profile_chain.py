"""Per-stage timing of the honest UE DL chain on the real TPU.

Times each stage of the bench.py cc_worker scope separately (jitted alone,
block_until_ready) for one BATCH of subframes, so the optimization targets
are visible.  Not part of the test suite.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "384"))
SNR_DB = 16.0
CFI = 2
RNTI = 0x46


def timeit(name, fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return out, dt


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

    key = jax.random.PRNGKey(0)

    @jax.jit
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
        snr_lin = 10.0 ** (SNR_DB / 10.0)
        p_sig = jnp.mean(jnp.abs(s) ** 2)
        sigma = jnp.sqrt(p_sig / snr_lin / 2.0)
        nre, nim = jax.random.normal(key, (2,) + s.shape, jnp.float32) * sigma
        rx = s + jax.lax.complex(nre, nim)
        return rx

    rx, _ = timeit("encode+awgn (untimed in bench)", encode, key)

    fft_est = jax.jit(lambda rx: ue.fft_estimate(rx, sf_idx))
    (grid, ce, info), t_fft = timeit("fft_estimate", fft_est, rx)

    pcf = Pcfich(cell, sf_idx)
    _, t_pcfich = timeit("pcfich", jax.jit(lambda g, c: pcf.decode(g, c)),
                         grid, ce)

    @jax.jit
    def pdcch_search(grid, ce):
        def search_one(g1, ce1):
            ok, cand = pd._decode_mixed_traced(
                g1, ce1, tuple(groups.values()), dci_len, mask)
            match = jnp.all(cand == dci_bits[None, :], axis=-1)
            return jnp.any(ok & match)
        return jax.vmap(search_one)(grid, ce)

    _, t_pdcch = timeit("pdcch blind search (mixed)", pdcch_search, grid, ce)

    noise = info["noise"]
    _, t_pdsch = timeit("pdsch.decode (full)",
                        jax.jit(lambda g, c, n: pdsch.decode(g, c, n)),
                        grid, ce, noise)

    # --- inside pdsch: stage splits ---
    from srslte_tpu.phy.phch import dlsch

    @jax.jit
    def pdsch_llr(grid, ce, noise):
        return pdsch.llr(grid, ce, noise)

    try:
        llr, t_llr = timeit("  pdsch llr (eq+demod+descr)", pdsch_llr, grid,
                            ce, noise)
        have_llr = True
    except AttributeError:
        print("  (pdsch.llr not exposed; skipping split)")
        have_llr = False

    if have_llr:
        cfg = pdsch.dlsch_cfg if hasattr(pdsch, "dlsch_cfg") else None
        if cfg is None:
            from srslte_tpu.phy.phch.dlsch import DlschConfig
            cfg = DlschConfig(tbs=tbs, G=llr.shape[-1], Qm=6)
        _, t_derm = timeit("  derm clusters (gather)",
                           jax.jit(lambda l: [w for _, _, w in
                                              dlsch._derm_clusters(l, cfg)]),
                           llr)

        ws = jax.jit(lambda l: [w for _, _, w in dlsch._derm_clusters(l, cfg)])(llr)
        from srslte_tpu.phy.fec.tdec import turbo_decode
        for (K, f0, _), w in zip(
                [(K, f0, None) for K, f0, _ in dlsch._derm_clusters(llr, cfg)], ws):
            flat = w.reshape((-1, w.shape[-1]))
            _, t1 = timeit(f"  turbo K={K} n={flat.shape[0]} 1 iter",
                           jax.jit(lambda f: turbo_decode(f, K, n_iter=1)[0]),
                           flat)
            _, t2 = timeit(f"  turbo K={K} n={flat.shape[0]} 2 iter",
                           jax.jit(lambda f: turbo_decode(f, K, n_iter=2)[0]),
                           flat)

    total = t_fft + t_pcfich + t_pdcch + t_pdsch
    sf_len = cell.ofdm.sf_len
    print(f"{'TOTAL (sum of stages)':40s} {total*1e3:9.2f} ms")
    print(f"implied Msps: {BATCH * sf_len / total / 1e6:.1f}")


if __name__ == "__main__":
    main()

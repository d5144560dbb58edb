"""Turbo decode sub-stage timings on the bench shapes (384 sf, mcs27)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timed(f, *args, reps=6):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    from srslte_tpu.phy.phch.dlsch import DlschConfig, _derm_clusters
    from srslte_tpu.phy.fec.tdec import turbo_decode
    from srslte_tpu.phy.fec import crc as crcmod
    from srslte_tpu.phy.fec.turbo import qpp_perm
    from srslte_tpu.ops.tdec_pallas import (prepare_beta_init, prepare_windows,
                                            prepare_windows_roll,
                                            siso_from_windows)

    B = 384
    tbs = 75376
    G = 86400  # approx bench G; exact value irrelevant for timing
    cfg = DlschConfig(tbs=tbs, G=G, Qm=6)
    print("groups:", [(g.count, g.K, g.E, g.F) for g in cfg.groups])
    key = jax.random.PRNGKey(0)
    llr = jax.random.normal(key, (B, G), jnp.float32)

    f_derm = jax.jit(lambda x: [w for _, _, w in _derm_clusters(x, cfg)][0])
    w0 = f_derm(llr)
    print("derm out:", w0.shape, f"{timed(f_derm, llr)*1e3:.2f} ms")

    K = cfg.groups[0].K
    Ng = B * sum(g.count for g in cfg.groups)
    flat = w0.reshape(-1, w0.shape[-1])
    print("flat:", flat.shape)

    d = K + 4
    sys_ = flat[..., :K]
    par1 = flat[..., d:d + K]
    pi = jnp.asarray(qpp_perm(K))

    f_pw_roll = jax.jit(lambda x: prepare_windows_roll(x, K, 128, 32))
    f_pw = jax.jit(lambda x: prepare_windows(x, K, 128, 32))
    f_pw_perm = jax.jit(lambda x: prepare_windows(x, K, 128, 32, perm=pi))
    print(f"prepare_windows_roll: {timed(f_pw_roll, sys_)*1e3:.2f} ms")
    print(f"prepare_windows:      {timed(f_pw, sys_)*1e3:.2f} ms")
    print(f"prepare_windows perm: {timed(f_pw_perm, sys_)*1e3:.2f} ms")

    sa_w = f_pw(sys_)
    pr_w = f_pw(par1)
    tx = flat[..., :3] * 0
    b0 = jax.jit(lambda a, b: prepare_beta_init(a, b, Ng, K, 128, 32))(tx, tx)
    f_siso = jax.jit(lambda a, b, c: siso_from_windows(a, b, c, Ng, K, 128, 32,
                                                       emit_ext=True))
    print(f"siso_from_windows:    {timed(f_siso, sa_w, pr_w, b0)*1e3:.2f} ms")

    f_t1 = jax.jit(lambda x: turbo_decode(x, K, n_iter=1)[0].sum())
    f_t2 = jax.jit(lambda x: turbo_decode(x, K, n_iter=2)[0].sum())
    t1 = timed(f_t1, flat)
    t2 = timed(f_t2, flat)
    print(f"turbo n1: {t1*1e3:.2f} ms  n2: {t2*1e3:.2f}  marginal: {(t2-t1)*1e3:.2f}")

    pb, po = crcmod.LTE_CRC24B
    hard = (sys_ > 0).astype(jnp.uint8)
    f_crc = jax.jit(lambda h: crcmod.crc_ok_device(h, pb, po).sum())
    print(f"crc24b over {hard.shape}: {timed(f_crc, hard)*1e3:.2f} ms")

    # gather-only: one [B,K] permutation gather
    f_g = jax.jit(lambda x: x[..., pi] * 1.0)
    print(f"plain [Ng,K] perm gather: {timed(f_g, sys_)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

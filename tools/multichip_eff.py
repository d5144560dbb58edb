"""Multi-chip scaling-efficiency harness (BASELINE: >=80% at N >= 2 chips).

Measures the full DL chain's throughput at 1 device vs N devices for both
parallelization axes and prints one JSON line:

  carrier axis  — embarrassingly parallel cc_worker sharding
                  (parallel/pipeline.py)
  time axis     — time-block sharding with the chest halo over ICI
                  (parallel/time_shard.py)

On the axon tunnel only one real chip exists, so by default this runs on N
virtual CPU devices (`--cpu N`): the efficiency number then reflects the
partitioned program's overhead structure (collective count, re-layout), not
real ICI bandwidth — the harness is ready to run unchanged on a real mesh.

Usage: python tools/multichip_eff.py [--cpu 8] [--n-sf 32] [--prb 25]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=8,
                    help="force N virtual CPU devices (0 = real backend)")
    ap.add_argument("--n-sf", type=int, default=32)
    ap.add_argument("--prb", type=int, default=25)
    ap.add_argument("--mcs", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.cpu}")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from srslte_tpu.parallel import make_mesh
    from srslte_tpu.parallel.time_shard import TimeShardedDlChain
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.phch.ra import DlGrant

    n_dev = len(jax.devices())
    cell = Cell(n_prb=args.prb, id=3, nof_ports=1)
    chain = TimeShardedDlChain(cell, DlGrant.full(args.prb, args.mcs))
    rng = np.random.default_rng(0)
    n_sf = args.n_sf - args.n_sf % n_dev
    bits = jnp.asarray(rng.integers(0, 2, (n_sf, chain.tbs))
                       .astype(np.float32))
    s = np.asarray(chain.encode(bits))
    s = s + 0.01 * (rng.standard_normal(s.shape)
                    + 1j * rng.standard_normal(s.shape))
    rx = jnp.asarray(s.astype(np.complex64))

    def bench(f):
        f()  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            b, ok = f()
        np.asarray(ok)
        return (time.perf_counter() - t0) / args.reps

    t1 = bench(lambda: chain.rx(rx))
    mesh = make_mesh({"t": n_dev})
    tn = bench(lambda: chain.rx_sharded(rx, mesh))
    samples_per_sf = cell.ofdm.sf_len
    thr1 = n_sf * samples_per_sf / t1 / 1e6
    thrn = n_sf * samples_per_sf / tn / 1e6
    eff = thrn / (thr1 * n_dev)
    out = {"n_devices": n_dev, "n_sf": n_sf,
           "unsharded_msps": round(thr1, 3),
           "time_sharded_msps": round(thrn, 3),
           "scaling_efficiency": round(eff, 4),
           "backend": jax.default_backend()}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

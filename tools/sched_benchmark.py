"""Scheduler throughput benchmark — srsenb/test/mac/sched_benchmark.cc analog.

Measures DL+UL scheduling rate (TTIs/s) and aggregate scheduled throughput
for N UEs with full buffers, at several cell bandwidths and policies, and
checks the per-TTI 3GPP invariants the whole way (no silent corruption at
speed).

Usage: python tools/sched_benchmark.py [--ttis 2000] [--ues 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from srslte_tpu.mac.sched import SchedDl, SchedUl  # noqa: E402
from srslte_tpu.phy.common.params import Cell  # noqa: E402


def run_case(n_prb: int, n_ues: int, policy: str, ttis: int) -> dict:
    cell = Cell(n_prb=n_prb, id=1)
    dl = SchedDl(cell, policy=policy, cfi=2)
    ul = SchedUl(cell)
    for i in range(n_ues):
        dl.add_ue(0x46 + i, cqi=7 + i % 8)
        ul.ul_bsr(0x46 + i, 1 << 20)
    tbs_sum = 0
    t0 = time.perf_counter()
    for tti in range(ttis):
        for i in range(n_ues):
            dl.buffer_state(0x46 + i, 1 << 20)
        allocs = dl.schedule(tti)
        dl.check_invariants(allocs)
        used = {a.loc for a in allocs if hasattr(a, "loc")}
        ul_allocs = ul.schedule(tti, used_cce=None)
        ul.check_invariants(ul_allocs)
        tbs_sum += sum(a.tbs for a in allocs)
    dt = time.perf_counter() - t0
    return {"n_prb": n_prb, "ues": n_ues, "policy": policy,
            "tti_per_s": round(ttis / dt), "dl_mbps": round(
                tbs_sum / (ttis * 1e-3) / 1e6, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ttis", type=int, default=2000)
    ap.add_argument("--ues", type=int, default=8)
    args = ap.parse_args()
    for n_prb in (25, 50, 100):
        for policy in ("rr", "pf"):
            print(run_case(n_prb, args.ues, policy, args.ttis))


if __name__ == "__main__":
    main()

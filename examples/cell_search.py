"""Standalone cell scanner — lib/examples/cell_search.c analog.

Scans an IQ capture (complex64 file) for LTE cells: batched PSS/SSS search
over every half-frame window, majority vote on the PCI, CFO estimate, then
MIB decode for the system bandwidth.  The reference scans an EARFCN range
over live RF; on TPU hosts the input is a capture or virtual-RF stream.

Usage: python examples/cell_search.py in.bin --prb 6
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from srslte_tpu.phy.common.params import Cell, OfdmParams  # noqa: E402
from srslte_tpu.phy.ue.ue_cell_search import cell_search  # noqa: E402
from srslte_tpu.phy.ue.ue_mib import UeMib  # noqa: E402
from srslte_tpu.phy.ue.ue_sync import UeSync  # noqa: E402
from srslte_tpu.utils import to_device_complex  # noqa: E402


def scan(samples: np.ndarray, n_prb: int):
    p = OfdmParams(n_prb)
    x = to_device_complex(samples)
    cs = cell_search(x, p)
    cell_id = int(np.asarray(cs.cell_id))
    if cell_id < 0:
        return None
    out = {"cell_id": cell_id, "cfo_sc": float(np.asarray(cs.cfo)),
           "votes": int(np.asarray(cs.votes))}
    cell = Cell(n_prb=n_prb, id=cell_id, nof_ports=1)
    sync = UeSync(cell)
    st = sync.find(x)
    if st is not None:
        try:
            sfs, _ = sync.track_block(x, st, n_sf=10)
        except ValueError:
            return out
        mib_dec = UeMib(cell_id, n_prb)
        for i in range(sfs.shape[0]):
            ok, mib, phase, ports = mib_dec.decode(sfs[i])
            if ok:
                out["mib"] = mib
                out["nof_ports"] = ports
                break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("--prb", type=int, default=6,
                    help="scan numerology (sets the sample rate)")
    a = ap.parse_args()
    got = scan(np.fromfile(a.infile, np.complex64), a.prb)
    if got is None:
        print("no cell found")
        sys.exit(1)
    print(f"found cell: PCI {got['cell_id']}, CFO {got['cfo_sc']:.3f} "
          f"subcarriers, votes {got['votes']}")
    if got.get("mib") is not None:
        print(f"MIB: {got['mib']}")
    sys.exit(0)


if __name__ == "__main__":
    main()

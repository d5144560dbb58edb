"""Standalone LTE receiver — lib/examples/pdsch_ue.c equivalent.

Full blind receive chain from an IQ capture (or live UDP stream):
cell search -> PSS/SSS sync -> MIB decode -> PDCCH blind DCI search ->
PDSCH decode, printing per-subframe results.  Only the RNTI (and the file's
sample rate via --prb) must be known, as with the reference example.

Usage: python examples/pdsch_ue.py in.bin --prb 6 --rnti 0x1234
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp  # noqa: E402

from srslte_tpu.phy.common.params import Cell, OfdmParams  # noqa: E402
from srslte_tpu.phy.io import FileSource  # noqa: E402
from srslte_tpu.phy.phch.dci import unpack_format1a  # noqa: E402
from srslte_tpu.phy.phch.pcfich import Pcfich  # noqa: E402
from srslte_tpu.phy.phch.pdcch import Pdcch  # noqa: E402
from srslte_tpu.phy.phch.dci import format0_1a_size  # noqa: E402
from srslte_tpu.phy.phch.pdsch import Pdsch  # noqa: E402
from srslte_tpu.phy.ue.ue_cell_search import cell_search  # noqa: E402
from srslte_tpu.phy.ue.ue_dl import UeDl  # noqa: E402
from srslte_tpu.phy.ue.ue_mib import UeMib  # noqa: E402
from srslte_tpu.phy.ue.ue_sync import UeSync  # noqa: E402
from srslte_tpu.utils import to_device_complex  # noqa: E402

def receive(samples: np.ndarray, n_prb: int, rnti: int, max_sf: int = 20):
    """Blind receive; returns a list of per-subframe result dicts."""
    p = OfdmParams(n_prb)
    samples = to_device_complex(samples)  # axon-safe complex transfer
    cs = cell_search(samples, p)
    cell_id = int(np.asarray(cs.cell_id))
    if cell_id < 0:
        return {"cell": None, "results": []}
    print(f"cell search: PCI {cell_id}, CFO {float(np.asarray(cs.cfo)):.3f} sc, "
          f"votes {int(np.asarray(cs.votes))}")

    cell = Cell(n_prb=n_prb, id=cell_id, nof_ports=1)
    sync = UeSync(cell)
    st = sync.find(samples)
    assert st is not None and st.cell_id == cell_id

    ue = UeDl(cell)
    mib = None
    results = []
    dci_size = format0_1a_size(n_prb)
    while len(results) < max_sf:
        try:
            sfs, st_next = sync.track_block(samples, st, n_sf=5)
        except ValueError:
            break  # stream exhausted
        for i in range(5):
            sf_idx = (st.sf_idx + i) % 10
            sf = sfs[i]
            if sf_idx == 0 and mib is None:
                ok, mib_dec, phase, ports = UeMib(cell_id, n_prb).decode(sf)
                if ok:
                    mib = mib_dec
                    print(f"MIB: {mib} (frame phase {phase}, {ports} port)")
            grid, ce, info = ue.fft_estimate(sf, sf_idx)
            cfi = int(np.asarray(Pcfich(cell, sf_idx).decode(grid, ce)[0]))
            pd = Pdcch(cell, cfi, sf_idx)
            hits = pd.search(grid, ce, rnti, dci_size)
            entry = {"sf_idx": sf_idx, "cfi": cfi, "dci": None, "crc_ok": False}
            for loc, bits in hits:
                dci = unpack_format1a(bits, n_prb)
                if dci is None:
                    continue
                entry["dci"] = dci
                pdsch = Pdsch(cell, dci.grant(n_prb, rnti), sf_idx, cfi=cfi,
                              rnti=rnti)
                out, ok = pdsch.decode(grid, ce, info["noise"])
                entry["crc_ok"] = bool(np.asarray(ok))
                entry["bits"] = np.asarray(out)
                break
            results.append(entry)
        st = st_next
    return {"cell": cell, "mib": mib, "results": results}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--prb", type=int, default=6)
    ap.add_argument("--rnti", type=lambda x: int(x, 0), default=0x1234)
    ap.add_argument("--max-sf", type=int, default=20)
    args = ap.parse_args(argv)

    src = FileSource(args.input)
    samples = src.read(10**9)
    src.close()
    out = receive(samples, args.prb, args.rnti, args.max_sf)
    n_ok = sum(r["crc_ok"] for r in out["results"])
    print(f"decoded {n_ok}/{len(out['results'])} PDSCH subframes OK")
    return out


if __name__ == "__main__":
    main()

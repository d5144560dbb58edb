"""Standalone DL transmitter — lib/examples/pdsch_enodeb.c equivalent.

Generates LTE radio frames (CRS + PSS/SSS + PBCH + PCFICH + PDCCH DCI-1A +
PDSCH with a seeded random payload) into an IQ capture file (or UDP), which
examples/pdsch_ue.py can receive and decode without prior coordination
beyond the RNTI.

Usage: python examples/pdsch_enodeb.py out.bin --prb 6 --cell-id 123 \
           --mcs 5 --rnti 0x1234 --frames 2
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from srslte_tpu.phy.common.params import Cell  # noqa: E402
from srslte_tpu.phy.enb.enb_dl import EnbDl  # noqa: E402
from srslte_tpu.phy.io import FileSink  # noqa: E402
from srslte_tpu.phy.phch.dci import Dci1A, pack_format1a  # noqa: E402
from srslte_tpu.phy.phch.pbch import Mib  # noqa: E402
from srslte_tpu.phy.phch.pdcch import Pdcch, ue_locations  # noqa: E402
from srslte_tpu.phy.phch.pdsch import Pdsch  # noqa: E402
from srslte_tpu.phy.phch.ra import DlGrant  # noqa: E402

CFI = 2


def make_frame(cell: Cell, rnti: int, mcs: int, sfn: int, seed: int):
    """One 10-ms frame of samples: ([10, sf_len] float32 (re, im) pairs, tbs)."""
    enb = EnbDl(cell)
    mib = Mib(cell.n_prb, cell.phich_length, cell.phich_resources, sfn)
    dci = Dci1A(rb_start=0, l_crb=cell.n_prb, mcs=mcs)
    payload = pack_format1a(dci, cell.n_prb)
    grant = dci.grant(cell.n_prb)

    @jax.jit
    def gen(bits_frame):
        outs = []
        for sf in range(10):
            g = enb.put_base(enb.empty_grids(), sf)
            if sf == 0:
                g = enb.put_pbch(g, mib)
            g = enb.put_pcfich(g, sf, CFI)
            pd = Pdcch(cell, CFI, sf)
            loc = ue_locations(pd.n_cce, rnti, sf)[0]
            g = enb.put_pdcch(g, sf, CFI, payload, rnti, loc)
            pdsch = Pdsch(cell, grant, sf, cfi=CFI, rnti=rnti)
            g = enb.put_pdsch(g, pdsch, bits_frame[sf])
            s = enb.gen_signal(g)[0]  # port 0
            outs.append(jnp.stack([s.real, s.imag], -1))
        return jnp.stack(outs)

    rng = np.random.default_rng(seed)
    tbs = grant.tbs
    bits = rng.integers(0, 2, (10, tbs)).astype(np.uint8)
    return np.asarray(gen(jnp.asarray(bits))), bits


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--prb", type=int, default=6)
    ap.add_argument("--cell-id", type=int, default=123)
    ap.add_argument("--mcs", type=int, default=5)
    ap.add_argument("--rnti", type=lambda x: int(x, 0), default=0x1234)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    cell = Cell(n_prb=args.prb, id=args.cell_id, nof_ports=1)
    sink = FileSink(args.output)
    for f in range(args.frames):
        sf2, _ = make_frame(cell, args.rnti, args.mcs, sfn=f, seed=args.seed)
        samples = (sf2[..., 0] + 1j * sf2[..., 1]).reshape(-1)
        sink.write(samples.astype(np.complex64))
    sink.close()
    print(f"wrote {args.frames} frames ({args.prb} PRB, cell {args.cell_id}) "
          f"to {args.output}")


if __name__ == "__main__":
    main()

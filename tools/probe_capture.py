"""Probe the reference's committed off-air captures with our RX chain.

Exploration tool for building tests/test_reference_captures.py.
"""
import os
import sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo")

from srslte_tpu.phy.common.params import Cell, OfdmParams
from srslte_tpu.phy.ue.ue_dl import UeDl
from srslte_tpu.phy.ue.ue_mib import UeMib
from srslte_tpu.phy.phch.pcfich import Pcfich
from srslte_tpu.phy.phch.pdcch import Pdcch
from srslte_tpu.phy.phch.dci import unpack_format1a, format0_1a_size
from srslte_tpu.utils import to_device_complex

REF = "/root/reference/lib/src/phy/phch/test"


def load(path):
    return np.fromfile(path, dtype=np.complex64)


def probe_pbch():
    x = load(f"{REF}/signal.1.92M.dat")
    print("pbch file:", x.shape, "subframes:", len(x) / 1920)
    sf0 = x[:1920]
    for cell_id in (150,):
        mib = UeMib(cell_id, 6)
        out = mib.decode(to_device_complex(sf0))
        print("cell", cell_id, "->", out)


def probe_amar():
    x = load(f"{REF}/signal.1.92M.amar.dat")
    print("amar file:", x.shape, "subframes:", len(x) / 1920)
    cell = Cell(n_prb=6, id=1, nof_ports=1)
    ue = UeDl(cell)
    # Try MIB on sf 0 first
    mib = UeMib(1, 6)
    print("MIB sf0:", mib.decode(to_device_complex(x[:1920])))
    dci_size = format0_1a_size(6)
    for sf_idx in range(10):
        sf = to_device_complex(x[sf_idx * 1920:(sf_idx + 1) * 1920])
        grid, ce, info = ue.fft_estimate(sf, sf_idx)
        cfi, corr = Pcfich(cell, sf_idx).decode(grid, ce)
        cfi = int(np.asarray(cfi))
        print(f"sf {sf_idx}: cfi={cfi} corr={float(np.asarray(corr)):.2f}", end=" ")
        try:
            pd = Pdcch(cell, cfi, sf_idx)
            hits = pd.search(grid, ce, 0xFFFF, dci_size)
            print("hits:", [(str(l), b.tolist()) for l, b in hits])
        except Exception as e:
            print("pdcch err:", e)


def probe_10m():
    x = load(f"{REF}/signal.10M.dat")
    print("10M file:", x.shape)
    cell = Cell(n_prb=50, id=150, nof_ports=2)
    ue = UeDl(cell)
    sf = to_device_complex(x[:7680])
    grid, ce, info = ue.fft_estimate(sf, 0)
    cfi, corr = Pcfich(cell, 0).decode(grid, ce)
    print("cfi:", int(np.asarray(cfi)), "corr:", float(np.asarray(corr)))


if __name__ == "__main__":
    import os
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("pbch", "all"):
        probe_pbch()
    if which in ("amar", "all"):
        probe_amar()
    if which in ("10m", "all"):
        probe_10m()

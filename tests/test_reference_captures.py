"""Decode the reference's committed off-air IQ captures (external oracle).

These are the only test vectors in the reference repo that were produced by
real third-party hardware (lib/src/phy/phch/test/signal*.dat, decoded by
pbch_file_test.c / pcfich_file_test.c / pdsch_pdcch_file_test.c via
ue_sync.c:52 file replay).  Decoding them proves the whole RX chain against
36.211/36.212 rather than against our own encoder (self-generated stimulus
cancels systematic inversions).

Capture facts (derived here, cross-checked against the reference tests):

- signal.1.92M.dat: 5 subframes @ 1.92 Msps, PCI 150, 2 TX ports, 50-PRB MIB.
  pbch_file_test.c:45 commits the expected 24-bit BCH payload; we match it
  bit-exactly (SFN 28, PHICH norm/1).
- signal.1.92M.amar.dat: 10 aligned subframes @ 1.92 Msps from an Amarisoft
  eNB, PCI 1, 1 port, CFI 3.  pdsch_pdcch_file_test (args -c 1 -f 3 -n 6
  -p 1, SI-RNTI) requires a PDSCH decode; we blind-decode the SI-RNTI DCI
  (format 1A, full-band, N_prb_1A=3) and the SIB payloads CRC-OK.
- signal.10M.dat: a PCI-150 capture at the STANDARD 15.36 Msps rate for
  50 PRB (CP autocorrelation picks N_fft=1024 at 0.94; 768 scores 0.46).
  The committed pcfich_file_test args parse it at the reduced 11.52 Msps
  rate without passing -d (use_standard_lte_rates), so the upstream CFI=2
  expectation does not reproduce from this file; at the true rate, with
  PSS-derived timing, the PCFICH decodes CFI=1 with perfect correlation
  and the subframe-0 scrambling hypothesis is uniquely consistent.
"""

import numpy as np
import pytest

from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.phch.dci import format0_1a_size, unpack_format1a
from srslte_tpu.phy.phch.pcfich import Pcfich
from srslte_tpu.phy.phch.pdcch import Pdcch
from srslte_tpu.phy.phch.pdsch import Pdsch
from srslte_tpu.phy.sync.pss import pss_find
from srslte_tpu.phy.ue.ue_dl import UeDl
from srslte_tpu.phy.ue.ue_mib import UeMib
from srslte_tpu.utils import to_device_complex

REF = "/root/reference/lib/src/phy/phch/test"

# pbch_file_test.c:45 bch_payload_file
MIB_PAYLOAD = [0, 1, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1,
               1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]

SIB1_HEX = "6040040300011a2d4018028180420c800000"
SIB2_HEX = "00800c61bc8ca883d601ba01000408019739dcb2d5425c700308518b613a9690"


def _load(name):
    return np.fromfile(f"{REF}/{name}", dtype=np.complex64)


def test_pbch_capture_bit_exact():
    """MIB from signal.1.92M.dat matches the committed payload bit-for-bit."""
    x = _load("signal.1.92M.dat")
    ok, mib, phase, ports = UeMib(150, 6).decode(to_device_complex(x[:1920]))
    assert ok
    assert ports == 2
    assert phase == 0  # = sfn_offset 0 in pbch_file_test.c:234
    assert mib.n_prb == 50
    assert mib.phich_length == "norm"
    assert mib.phich_resources == "1"
    assert mib.sfn == 28
    assert list(mib.pack()) == MIB_PAYLOAD


class TestAmarCapture:
    """Full control+data RX chain on the Amarisoft off-air capture."""

    @pytest.fixture(scope="class")
    def subframes(self):
        x = _load("signal.1.92M.amar.dat")
        assert len(x) == 10 * 1920
        return x

    def test_mib(self, subframes):
        ok, mib, phase, ports = UeMib(1, 6).decode(
            to_device_complex(subframes[:1920]))
        assert ok and ports == 1 and phase == 0
        assert mib.n_prb == 6 and mib.sfn == 656

    def test_cfi_all_subframes(self, subframes):
        cell = Cell(n_prb=6, id=1, nof_ports=1)
        ue = UeDl(cell)
        for sf_idx in range(10):
            sf = to_device_complex(subframes[sf_idx * 1920:(sf_idx + 1) * 1920])
            grid, ce, _ = ue.fft_estimate(sf, sf_idx)
            cfi, corr = Pcfich(cell, sf_idx).decode(grid, ce)
            assert int(np.asarray(cfi)) == 3, f"sf {sf_idx}"
            assert float(np.asarray(corr)) > 0.9, f"sf {sf_idx}"

    @pytest.mark.parametrize("sf_idx,mcs,rv,tbs,payload_hex", [
        (5, 2, 0, 144, SIB1_HEX),   # SIB1 (SI-RNTI, N_prb_1A=3)
        (2, 6, 3, 256, SIB2_HEX),   # SI message retransmission (rv 3)
    ])
    def test_sib_pdsch_decode(self, subframes, sf_idx, mcs, rv, tbs,
                              payload_hex):
        cell = Cell(n_prb=6, id=1, nof_ports=1)
        ue = UeDl(cell)
        sf = to_device_complex(subframes[sf_idx * 1920:(sf_idx + 1) * 1920])
        grid, ce, info = ue.fft_estimate(sf, sf_idx)
        hits = Pdcch(cell, 3, sf_idx).search(grid, ce, 0xFFFF,
                                             format0_1a_size(6))
        assert hits, "blind search found no SI-RNTI DCI"
        dci = unpack_format1a(hits[0][1], 6)
        assert dci is not None
        assert (dci.rb_start, dci.l_crb) == (0, 6)
        assert dci.mcs == mcs and dci.rv == rv
        grant = dci.grant(6, 0xFFFF)
        assert grant.tbs == tbs
        out, ok = Pdsch(cell, grant, sf_idx, cfi=3, rnti=0xFFFF).decode(
            grid, ce, info["noise"])
        assert bool(np.asarray(ok)), "PDSCH CRC failed"
        got = np.packbits(np.asarray(out).astype(np.uint8)).tobytes().hex()
        assert got == payload_hex

    def test_no_false_dci(self, subframes):
        """Subframes without SI carry no SI-RNTI DCI (blind-search false-alarm
        check, mirrors the 'No DCI found' path of pdsch_pdcch_file_test)."""
        cell = Cell(n_prb=6, id=1, nof_ports=1)
        ue = UeDl(cell)
        for sf_idx in (0, 1, 3):
            sf = to_device_complex(subframes[sf_idx * 1920:(sf_idx + 1) * 1920])
            grid, ce, _ = ue.fft_estimate(sf, sf_idx)
            hits = Pdcch(cell, 3, sf_idx).search(grid, ce, 0xFFFF,
                                                 format0_1a_size(6))
            assert not hits, f"false DCI in sf {sf_idx}: {hits}"


def test_blind_receiver_on_amar_capture():
    """examples/pdsch_ue.py full blind chain (cell search -> sync -> MIB ->
    PCFICH -> PDCCH -> PDSCH) on the off-air capture, like the reference's
    pdsch_ue example in file mode."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "pdsch_ue_example",
        os.path.join(os.path.dirname(__file__), "..", "examples", "pdsch_ue.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    x = _load("signal.1.92M.amar.dat")
    out = mod.receive(x, 6, 0xFFFF, max_sf=10)
    assert out["cell"].id == 1
    assert out["mib"] is not None and out["mib"].sfn == 656
    decoded = [r for r in out["results"] if r["crc_ok"]]
    assert decoded, "blind receiver decoded no SI PDSCH"
    assert all(r["cfi"] == 3 for r in out["results"])


def test_10m_capture_sync_and_cfi():
    """signal.10M.dat at its true standard rate: PSS/PCI + decisive CFI."""
    x = _load("signal.10M.dat")
    corr = np.asarray(pss_find(to_device_complex(x), 1024))
    n_id_2 = int(corr.max(axis=-1).argmax())
    assert n_id_2 == 0  # PCI 150 -> N_id_2 = 0
    peak = int(corr[0].argmax())
    assert float(corr[0].max()) > 0.9
    # PSS useful-symbol start is 6656 samples into the subframe
    sf_start = peak - 6656
    assert abs(sf_start) < 16  # file is subframe-aligned up to a few samples
    sf = np.zeros(15360, np.complex64)
    avail = np.concatenate([np.zeros(max(0, -sf_start), np.complex64),
                            x[max(0, sf_start):]])
    sf[:min(len(avail), 15360)] = avail[:15360]
    cell = Cell(n_prb=50, id=150, nof_ports=2)
    grid, ce, _ = UeDl(cell).fft_estimate(to_device_complex(sf), 0)
    best = []
    for sf_idx in range(10):
        cfi, c = Pcfich(cell, sf_idx).decode(grid, ce)
        best.append((float(np.asarray(c)), sf_idx, int(np.asarray(cfi))))
    conf, sf_idx, cfi = max(best)
    assert conf > 0.99         # perfect-correlation decode
    assert sf_idx == 0         # uniquely consistent with subframe-0 scrambling
    assert cfi == 1

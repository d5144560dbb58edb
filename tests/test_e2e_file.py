"""End-to-end file-replay test: pdsch_enodeb example -> IQ file (+ CFO/delay/
noise impairments) -> pdsch_ue blind receive chain.

Analog of the reference's recorded-signal vector tests
(pdsch_pdcch_file_test.c over signal*.dat, SURVEY.md §4.2): the receiver gets
ONLY the sample stream, bandwidth, and RNTI.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from examples.pdsch_enodeb import make_frame
from examples.pdsch_ue import receive
from srslte_tpu.phy.common.params import Cell

RNTI = 0x1234


def _stream(cell, mcs=5, frames=3, seed=7):
    sfs = []
    bits = None
    for f in range(frames):
        sf2, bits = make_frame(cell, RNTI, mcs, sfn=f, seed=seed)
        sfs.append((sf2[..., 0] + 1j * sf2[..., 1]).reshape(-1))
    return np.concatenate(sfs).astype(np.complex64), bits


def test_file_replay_clean():
    cell = Cell(n_prb=6, id=123, nof_ports=1)
    stream, bits = _stream(cell)
    out = receive(stream, 6, RNTI, max_sf=10)
    assert out["cell"] is not None and out["cell"].id == 123
    assert out["mib"] is not None and out["mib"].n_prb == 6
    res = out["results"]
    ok = [r for r in res if r["crc_ok"]]
    assert len(ok) >= 8, [r["sf_idx"] for r in res]
    for r in ok:
        np.testing.assert_array_equal(r["bits"], bits[r["sf_idx"]])


def test_file_replay_impaired():
    """Delay + CFO + noise, like replaying an off-air capture."""
    cell = Cell(n_prb=6, id=301, nof_ports=1)
    stream, bits = _stream(cell, mcs=4, frames=3, seed=9)
    rng = np.random.default_rng(1)
    p = cell.ofdm
    delay = 1234
    cfo = 0.18
    x = np.concatenate([np.zeros(delay, np.complex64), stream])
    x = x * np.exp(2j * np.pi * cfo * np.arange(len(x)) / p.symbol_sz)
    x = x + 0.02 * (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
    out = receive(x.astype(np.complex64), 6, RNTI, max_sf=10)
    assert out["cell"] is not None and out["cell"].id == 301
    assert out["mib"] is not None
    ok = [r for r in out["results"] if r["crc_ok"]]
    assert len(ok) >= 7, [(r["sf_idx"], r["crc_ok"]) for r in out["results"]]
    for r in ok:
        np.testing.assert_array_equal(r["bits"], bits[r["sf_idx"]])

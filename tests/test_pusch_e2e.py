"""UL chain tests: DFT precoding, UL DMRS, chest_ul, PUSCH e2e.

Analog of lib/src/phy/phch/test/pusch_test.c self-checking loops.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.chest.refsignal_ul import base_sequence, pusch_dmrs
from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.enb.enb_ul import EnbUl
from srslte_tpu.phy.phch.dft_precoding import (dft_deprecode, dft_precode,
                                               valid_prb)
from srslte_tpu.phy.phch.pusch import Pusch, interleaver_indices
from srslte_tpu.phy.phch.ra_ul import UlGrant, ul_tbs
from srslte_tpu.phy.ue.ue_ul import UeUl


def test_valid_prb():
    valid = [n for n in range(1, 101) if valid_prb(n)]
    assert 7 not in valid and 14 not in valid
    assert {1, 2, 3, 4, 5, 6, 8, 9, 10, 12, 15, 16, 18, 20, 24, 25}.issubset(valid)


def test_dft_precode_roundtrip():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((3, 12, 300)) + 1j * rng.standard_normal((3, 12, 300))
         ).astype(np.complex64)
    y = dft_precode(jnp.asarray(x))
    z = dft_deprecode(y)
    np.testing.assert_allclose(np.asarray(z), x, atol=1e-4)
    # power preserved
    np.testing.assert_allclose(np.mean(np.abs(np.asarray(y)) ** 2),
                               np.mean(np.abs(x) ** 2), rtol=1e-5)


def test_base_sequence_properties():
    for u in (0, 7, 29):
        r = base_sequence(u, 0, 6)
        np.testing.assert_allclose(np.abs(r), 1.0, atol=1e-6)
        assert len(r) == 72
    # distinct groups are (near-)orthogonal-ish: just check not equal
    assert not np.allclose(base_sequence(0, 0, 6), base_sequence(1, 0, 6))


def test_pusch_dmrs_slots_differ_by_cyclic_shift():
    cell = Cell(n_prb=25, id=17)
    d = pusch_dmrs(cell, 3, 4)
    assert d.shape == (2, 48)
    np.testing.assert_allclose(np.abs(d), 1.0, atol=1e-6)


def test_interleaver_is_permutation():
    idx = interleaver_indices(12 * 48 * 2, 2, 12)
    assert sorted(idx.tolist()) == list(range(len(idx)))


@pytest.mark.parametrize("n_prb_alloc,mcs", [(4, 6), (8, 14), (24, 24)])
def test_pusch_e2e_ideal(n_prb_alloc, mcs):
    cell = Cell(n_prb=25, id=42)
    grant = UlGrant(prb_start=1, n_prb=n_prb_alloc, mcs=mcs)
    pusch = Pusch(cell, grant, sf_idx=2, rnti=0x77)
    ue, enb = UeUl(cell), EnbUl(cell)
    rng = np.random.default_rng(mcs)
    bits = rng.integers(0, 2, (grant.tbs,)).astype(np.uint8)
    s = ue.encode_pusch(pusch, jnp.asarray(bits))
    out, ok, info = enb.decode_pusch(s, pusch)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), bits)
    assert float(np.asarray(info["noise"])) < 1e-3


def test_pusch_e2e_channel_noise():
    cell = Cell(n_prb=50, id=101)
    grant = UlGrant(prb_start=10, n_prb=16, mcs=16)  # 16QAM
    pusch = Pusch(cell, grant, sf_idx=7, rnti=0x155)
    ue, enb = UeUl(cell), EnbUl(cell)
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, (grant.tbs,)).astype(np.uint8)
    s = np.asarray(ue.encode_pusch(pusch, jnp.asarray(bits)))
    h = 0.8 * np.exp(1j * 0.7)
    snr_db = 20.0
    sig = np.mean(np.abs(s) ** 2)
    sigma = np.sqrt(sig * abs(h) ** 2 / 10 ** (snr_db / 10) / 2)
    rx = h * s + sigma * (rng.standard_normal(s.shape) + 1j * rng.standard_normal(s.shape))
    out, ok, info = enb.decode_pusch(jnp.asarray(rx.astype(np.complex64)), pusch)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_ul_tbs_table():
    assert ul_tbs(0, 1) == 16
    assert ul_tbs(20, 50) == ul_tbs(19 + 1, 50)


def _uci_roundtrip(uci, mod_mcs=16, snr_db=18.0, seed=11, **payload):
    from srslte_tpu.phy.phch.uci import UciCfgUl

    cell = Cell(n_prb=50, id=33)
    grant = UlGrant(prb_start=5, n_prb=16, mcs=mod_mcs)
    pusch = Pusch(cell, grant, sf_idx=4, rnti=0x2ab, uci=UciCfgUl(**uci))
    ue, enb = UeUl(cell), EnbUl(cell)
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (grant.tbs,)).astype(np.uint8)
    s = np.asarray(ue.encode_pusch(pusch, jnp.asarray(bits), **payload))
    h = 0.9 * np.exp(1j * 0.4)
    sigma = np.sqrt(np.mean(np.abs(s) ** 2) * abs(h) ** 2
                    / 10 ** (snr_db / 10) / 2)
    rx = h * s + sigma * (rng.standard_normal(s.shape)
                          + 1j * rng.standard_normal(s.shape))
    out, ok, info = enb.decode_pusch(jnp.asarray(rx.astype(np.complex64)),
                                     pusch)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), bits)
    return info


@pytest.mark.parametrize("ack", [(0,), (1,)])
def test_pusch_uci_ack_1bit(ack):
    info = _uci_roundtrip({"o_ack": 1}, ack=jnp.asarray(ack, jnp.uint8),
                          seed=sum(ack))
    assert tuple(np.asarray(info["ack"])) == ack


@pytest.mark.parametrize("ack", [(0, 1), (1, 1)])
def test_pusch_uci_ack_2bit_and_ri(ack):
    info = _uci_roundtrip({"o_ack": 2, "o_ri": 1},
                          ack=jnp.asarray(ack, jnp.uint8),
                          ri=jnp.asarray((1,), jnp.uint8), seed=7 + sum(ack))
    assert tuple(np.asarray(info["ack"])) == ack
    assert tuple(np.asarray(info["ri"])) == (1,)


def test_pusch_uci_cqi_ack_ri_16qam():
    """Full UCI load on 16QAM: CQI block code + RI reserved + ACK puncture."""
    cqi = (1, 0, 1, 1, 0, 1, 0)
    info = _uci_roundtrip({"o_ack": 1, "o_ri": 1, "o_cqi": len(cqi)},
                          mod_mcs=18, ack=jnp.asarray((1,), jnp.uint8),
                          ri=jnp.asarray((0,), jnp.uint8),
                          cqi=np.asarray(cqi, np.uint8), seed=3)
    assert tuple(np.asarray(info["ack"])) == (1,)
    assert tuple(np.asarray(info["ri"])) == (0,)
    assert tuple(np.asarray(info["cqi"])) == cqi


def test_pusch_uci_long_ack():
    """4-bit HARQ-ACK: (32, O) block-coded long form filling whole groups."""
    ack = (1, 0, 1, 1)
    info = _uci_roundtrip({"o_ack": 4}, ack=jnp.asarray(ack, jnp.uint8),
                          seed=3)
    assert tuple(np.asarray(info["ack"])) == ack


def test_pusch_uci_long_cqi():
    """20-bit CQI report: CRC8 + tail-biting convolutional long form."""
    rng = np.random.default_rng(9)
    cqi = tuple(int(b) for b in rng.integers(0, 2, 20))
    info = _uci_roundtrip({"o_cqi": 20}, cqi=np.asarray(cqi, np.uint8),
                          seed=5)
    assert tuple(np.asarray(info["cqi"])) == cqi
    assert float(np.asarray(info["cqi_metric"])) == 1.0  # CRC8 passed


def test_pusch_uci_long_everything_16qam():
    """Long ACK + long CQI + RI together on 16QAM."""
    rng = np.random.default_rng(2)
    ack = (1, 1, 0, 1, 0)
    cqi = tuple(int(b) for b in rng.integers(0, 2, 16))
    info = _uci_roundtrip({"o_ack": 5, "o_ri": 1, "o_cqi": 16},
                          mod_mcs=18, ack=jnp.asarray(ack, jnp.uint8),
                          ri=jnp.asarray((1,), jnp.uint8),
                          cqi=np.asarray(cqi, np.uint8), seed=8)
    assert tuple(np.asarray(info["ack"])) == ack
    assert tuple(np.asarray(info["ri"])) == (1,)
    assert tuple(np.asarray(info["cqi"])) == cqi

"""Modulation/demodulation + scrambling tests (modem/test, scrambling/test analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.common import scrambling
from srslte_tpu.phy.modem.modem import Modulation, constellation, demod_soft, modulate

ALL_MODS = [Modulation.BPSK, Modulation.QPSK, Modulation.QAM16, Modulation.QAM64,
            Modulation.QAM256]


def test_constellation_matches_reference_tables():
    """Spot-check against lte_tables.c explicit values."""
    q = constellation(Modulation.QPSK)
    lv = 1 / np.sqrt(2)
    np.testing.assert_allclose(q, [lv + 1j * lv, lv - 1j * lv, -lv + 1j * lv, -lv - 1j * lv],
                               rtol=1e-6)
    t16 = constellation(Modulation.QAM16)
    l1, l2 = 1 / np.sqrt(10), 3 / np.sqrt(10)
    np.testing.assert_allclose(t16[0], l1 + 1j * l1, rtol=1e-6)
    np.testing.assert_allclose(t16[1], l1 + 1j * l2, rtol=1e-6)
    np.testing.assert_allclose(t16[2], l2 + 1j * l1, rtol=1e-6)
    np.testing.assert_allclose(t16[11], -l2 + 1j * l2, rtol=1e-6)
    # 64QAM b=000000 -> (3+3j)/sqrt(42) (36.211 table 7.1.4-1)
    t64 = constellation(Modulation.QAM64)
    np.testing.assert_allclose(t64[0], (3 + 3j) / np.sqrt(42), rtol=1e-6)
    np.testing.assert_allclose(t64[0b000011], (1 + 1j) / np.sqrt(42), rtol=1e-6)
    np.testing.assert_allclose(t64[0b001100], (5 + 5j) / np.sqrt(42), rtol=1e-6)
    np.testing.assert_allclose(t64[0b001111], (7 + 7j) / np.sqrt(42), rtol=1e-6)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_unit_average_energy(mod):
    t = constellation(mod)
    np.testing.assert_allclose(np.mean(np.abs(t) ** 2), 1.0, rtol=1e-6)


@pytest.mark.parametrize("mod", ALL_MODS)
def test_mod_demod_roundtrip_noiseless(mod):
    rng = np.random.default_rng(mod.value)
    n = 120 * mod.bits_per_symbol
    bits = rng.integers(0, 2, n).astype(np.uint8)
    if mod is Modulation.BPSK:
        # BPSK demod takes symbols -> one LLR per symbol
        sym = modulate(jnp.asarray(bits), mod)
        llr = np.asarray(demod_soft(sym, mod))
    else:
        sym = modulate(jnp.asarray(bits), mod)
        llr = np.asarray(demod_soft(sym, mod))
    hard = (llr > 0).astype(np.uint8)
    np.testing.assert_array_equal(hard, bits)


@pytest.mark.parametrize("mod", [Modulation.QPSK, Modulation.QAM16, Modulation.QAM64])
def test_demod_with_noise_mostly_correct(mod):
    rng = np.random.default_rng(7)
    n = 6000 * mod.bits_per_symbol
    bits = rng.integers(0, 2, n).astype(np.uint8)
    sym = np.asarray(modulate(jnp.asarray(bits), mod))
    noisy = sym + 0.05 * (rng.standard_normal(sym.shape) + 1j * rng.standard_normal(sym.shape))
    llr = np.asarray(demod_soft(jnp.asarray(noisy.astype(np.complex64)), mod))
    ber = np.mean((llr > 0).astype(np.uint8) != bits)
    assert ber < 1e-3


def test_scrambling_roundtrip():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 500).astype(np.uint8)
    seed = scrambling.pdsch_cinit(rnti=0x1234, q=0, sf_idx=3, cell_id=101)
    s = np.asarray(scrambling.scramble_bits(jnp.asarray(bits), seed))
    assert not np.array_equal(s, bits)
    np.testing.assert_array_equal(
        np.asarray(scrambling.scramble_bits(jnp.asarray(s), seed)), bits)


def test_scramble_llr_sign_consistency():
    """descramble(demod(mod(scramble(bits)))) must equal demod of unscrambled."""
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    seed = 0x5BF
    sb = scrambling.scramble_bits(jnp.asarray(bits), seed)
    sym = modulate(sb, Modulation.QPSK)
    llr = demod_soft(sym, Modulation.QPSK)
    descr = np.asarray(scrambling.scramble_llr(llr, seed))
    np.testing.assert_array_equal((descr > 0).astype(np.uint8), bits)

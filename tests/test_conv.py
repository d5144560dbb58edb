"""Convolutional codec tests — analog of fec/convolutional/test/viterbi_test.c."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.fec import convolutional as cc


def test_encoder_impulse_response():
    """First output triple of a leading 1 (zero tail-biting state) is g(0)=(1,1,1)."""
    bits = np.zeros((1, 40), np.uint8)
    bits[0, 0] = 1
    out = cc.conv_encode_np(bits)
    np.testing.assert_array_equal(out[0, :3], [1, 1, 1])
    # g taps: output k at delay d is bit d of generator (MSB=newest)
    taps = out[0].reshape(40, 3)[:7]
    gens_bits = [[(g >> (6 - d)) & 1 for d in range(7)] for g in cc.GENS]
    np.testing.assert_array_equal(taps.T, gens_bits)


def test_device_encoder_matches_host():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, (5, 40)).astype(np.uint8)
    np.testing.assert_array_equal(
        np.asarray(cc.conv_encode(jnp.asarray(bits), 40)), cc.conv_encode_np(bits))


def test_tail_biting_property():
    """Encoder output is invariant to circular shift by construction: encoding a
    rotated input equals rotating the coded triples."""
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (1, 40)).astype(np.uint8)
    c1 = cc.conv_encode_np(bits).reshape(40, 3)
    c2 = cc.conv_encode_np(np.roll(bits, 7, axis=-1)).reshape(40, 3)
    np.testing.assert_array_equal(np.roll(c1, 7, axis=0), c2)


@pytest.mark.parametrize("length", [40, 43, 72, 120])
def test_viterbi_noiseless(length):
    rng = np.random.default_rng(length)
    bits = rng.integers(0, 2, (8, length)).astype(np.uint8)
    coded = cc.conv_encode_np(bits)
    llr = -(1.0 - 2.0 * coded.astype(np.float32))  # positive => bit 1
    dec = np.asarray(cc.viterbi_decode(jnp.asarray(llr), length))
    np.testing.assert_array_equal(dec, bits)


def test_viterbi_awgn():
    """viterbi_test-style gate: rate-1/3 K=7 at Es/N0 ~ 2 dB decodes clean."""
    rng = np.random.default_rng(7)
    length = 40
    bits = rng.integers(0, 2, (50, length)).astype(np.uint8)
    coded = cc.conv_encode_np(bits)
    x = 1.0 - 2.0 * coded.astype(np.float32)
    esn0 = 10 ** (2.0 / 10)
    sigma = np.sqrt(1 / (2 * esn0))
    llr = -(x + sigma * rng.standard_normal(x.shape).astype(np.float32))
    dec = np.asarray(cc.viterbi_decode(jnp.asarray(llr), length))
    blers = np.any(dec != bits, axis=1).sum()
    assert blers == 0


@pytest.mark.parametrize("length", [43, 44])  # odd/even 3L radix-4 paths
def test_viterbi_awgn_dci_sizes(length):
    """DCI-sized blocks (payload+CRC ~ 43/44) through the radix-4 decoder
    at the blind-search operating point."""
    rng = np.random.default_rng(length)
    bits = rng.integers(0, 2, (50, length)).astype(np.uint8)
    coded = cc.conv_encode_np(bits)
    x = 1.0 - 2.0 * coded.astype(np.float32)
    sigma = np.sqrt(1 / (2 * 10 ** (2.0 / 10)))
    llr = -(x + sigma * rng.standard_normal(x.shape).astype(np.float32))
    dec = np.asarray(cc.viterbi_decode(jnp.asarray(llr), length))
    assert np.any(dec != bits, axis=1).sum() == 0


def test_rm_conv_roundtrip_pbch_sizes():
    """PBCH: 120 coded bits rate-matched to 1920 (norm CP), then combined back."""
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (2, 40)).astype(np.uint8)
    coded = cc.conv_encode_np(bits)  # [2, 120]
    e = np.asarray(cc.rm_conv_tx(jnp.asarray(coded), 1920))
    assert e.shape == (2, 1920)
    llr = -(1.0 - 2.0 * e.astype(np.float32))
    w = np.asarray(cc.rm_conv_rx(jnp.asarray(llr), 120))
    # 1920/120 = 16x repetition: every position combined 16 times
    np.testing.assert_allclose(np.abs(w), 16.0)
    dec = np.asarray(cc.viterbi_decode(jnp.asarray(w), 40))
    np.testing.assert_array_equal(dec, bits)


def test_rm_conv_puncturing():
    rng = np.random.default_rng(4)
    bits = rng.integers(0, 2, (4, 72)).astype(np.uint8)
    coded = cc.conv_encode_np(bits)  # [4, 216]
    e = np.asarray(cc.rm_conv_tx(jnp.asarray(coded), 144))  # rate 1/2
    llr = -(1.0 - 2.0 * e.astype(np.float32))
    w = cc.rm_conv_rx(jnp.asarray(llr), 216)
    dec = np.asarray(cc.viterbi_decode(w, 72))
    np.testing.assert_array_equal(dec, bits)

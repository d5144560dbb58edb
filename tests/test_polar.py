"""NR polar tests — analog of lib/src/phy/fec/polar/test: transform
involution, construction sanity, encode/decode round trips under AWGN for
the puncturing/shortening/repetition rate-matching regimes."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.fec.polar import (PolarCode, blk_interleaver, mother_code,
                                      polar_decode, polar_encode,
                                      polar_transform, q1024)


def test_q1024_is_permutation():
    q = q1024()
    assert sorted(q.tolist()) == list(range(1024))
    assert list(q[:6]) == [0, 1, 2, 4, 8, 16]


def test_mother_code_subsequence():
    m6 = mother_code(6)
    assert len(m6) == 64 and m6.max() == 63
    # subsequence property: same relative order as in Q^1024
    q = q1024()
    assert list(m6) == [x for x in q if x < 64]


def test_blk_interleaver_permutation():
    for n in (5, 7, 10):
        j = blk_interleaver(n)
        assert sorted(j.tolist()) == list(range(1 << n))


def test_polar_transform_involution():
    rng = np.random.default_rng(0)
    u = rng.integers(0, 2, (4, 128)).astype(np.uint8)
    x = polar_transform(jnp.asarray(u))
    back = polar_transform(x)  # G_N is an involution over GF(2)
    np.testing.assert_array_equal(np.asarray(back), u)


def test_construction_counts():
    c = PolarCode(K=56, E=164)
    assert c.N == 256  # n1 = ceil(log2 164) = 8 (164 > 9/8 * 128)
    assert (~c.frozen_mask).sum() == 56


@pytest.mark.parametrize("K,E", [(32, 100), (56, 164), (40, 500), (80, 96)])
def test_polar_e2e_awgn(K, E):
    code = PolarCode(K, E)
    rng = np.random.default_rng(K + E)
    bits = rng.integers(0, 2, (4, K)).astype(np.uint8)
    cw = np.asarray(polar_encode(jnp.asarray(bits), code)).astype(np.float32)
    llr = (2 * cw - 1) * 2.5 + rng.standard_normal(cw.shape).astype(np.float32) * 0.7
    out = polar_decode(jnp.asarray(llr), code)
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_polar_repetition_regime():
    code = PolarCode(K=20, E=400)  # E > N: repetition
    assert code.E > code.N
    rng = np.random.default_rng(5)
    bits = rng.integers(0, 2, (2, 20)).astype(np.uint8)
    cw = np.asarray(polar_encode(jnp.asarray(bits), code)).astype(np.float32)
    assert cw.shape[-1] == 400
    llr = (2 * cw - 1) * 1.0 + rng.standard_normal(cw.shape).astype(np.float32) * 1.0
    out = polar_decode(jnp.asarray(llr), code)
    np.testing.assert_array_equal(np.asarray(out), bits)

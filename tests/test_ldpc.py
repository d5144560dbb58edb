"""NR LDPC tests — analog of lib/src/phy/fec/ldpc/test: encoder parity
validity, decode under AWGN, rate-matching round trips, rv soft combining."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.fec.ldpc import (LdpcGraph, ldpc_check, ldpc_decode,
                                     ldpc_encode, ldpc_rm_rx, ldpc_rm_tx,
                                     lifting_index, valid_lifting_sizes)


def test_lifting_sizes():
    zs = valid_lifting_sizes()
    assert zs[0] == 2 and zs[-1] == 384 and len(zs) == 51
    assert lifting_index(384) == 1  # 384 = 3 * 2^7 -> a=3 set
    assert lifting_index(2) == 0
    assert lifting_index(15) == 7
    assert lifting_index(208) == 6  # 13 * 16 -> a=13 set


@pytest.mark.parametrize("bg,zc", [(1, 32), (1, 52), (2, 16), (2, 96)])
def test_encode_satisfies_parity(bg, zc):
    g = LdpcGraph(bg, zc)
    rng = np.random.default_rng(zc)
    bits = rng.integers(0, 2, (3, g.k)).astype(np.uint8)
    cw = ldpc_encode(jnp.asarray(bits), g)
    assert cw.shape == (3, g.n_full)
    assert bool(np.asarray(ldpc_check(cw, g)).all())
    np.testing.assert_array_equal(np.asarray(cw)[:, : g.k], bits)


@pytest.mark.parametrize("bg,zc", [(1, 32), (2, 64)])
def test_decode_awgn(bg, zc):
    g = LdpcGraph(bg, zc)
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, (4, g.k)).astype(np.uint8)
    cw = np.asarray(ldpc_encode(jnp.asarray(bits), g)).astype(np.float32)
    llr = (2 * cw - 1) * 2.0 + rng.standard_normal(cw.shape).astype(np.float32) * 0.9
    llr[:, : 2 * zc] = 0.0  # the punctured blocks are never transmitted
    out, ok = ldpc_decode(jnp.asarray(llr), g, n_iter=10)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_rm_roundtrip_and_rv_combining():
    g = LdpcGraph(1, 32)
    rng = np.random.default_rng(3)
    k_prime = g.k - 40  # 40 filler bits
    bits = rng.integers(0, 2, (2, g.k)).astype(np.uint8)
    bits[:, k_prime:] = 0  # fillers
    cw = ldpc_encode(jnp.asarray(bits), g)
    qm, e = 2, 1600  # heavily punctured single transmission

    def tx_llr(rv, seed):
        r = np.random.default_rng(seed)
        enc = np.asarray(ldpc_rm_tx(cw, g, e, rv, qm, k_prime)).astype(np.float32)
        return jnp.asarray((2 * enc - 1) * 1.2
                           + r.standard_normal(enc.shape).astype(np.float32))

    w0 = ldpc_rm_rx(tx_llr(0, 1), g, 0, qm, k_prime)
    out, ok = ldpc_decode(w0, g, n_iter=10)
    ok0 = bool(np.asarray(ok).all())
    w = w0 + ldpc_rm_rx(tx_llr(2, 2), g, 2, qm, k_prime)
    out, ok = ldpc_decode(w, g, n_iter=10)
    assert bool(np.asarray(ok).all())
    np.testing.assert_array_equal(np.asarray(out)[:, :k_prime],
                                  bits[:, :k_prime])
    assert not ok0 or True  # single punctured tx may or may not survive


def test_rm_indices_are_valid():
    g = LdpcGraph(2, 48)
    from srslte_tpu.phy.fec.ldpc import ldpc_rm_indices

    for rv in (0, 1, 2, 3):
        idx = ldpc_rm_indices(g, 2000, rv, 4, g.k - 16)
        assert idx.min() >= 2 * g.zc  # punctured blocks never selected
        assert idx.max() < g.n_full
        filler = (idx >= g.k - 16) & (idx < g.k)
        assert not filler.any()

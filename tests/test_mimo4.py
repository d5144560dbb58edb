"""4-port operation: rank-4 spatial multiplexing, 4-port control channels,
extended-CP PBCH.

Reference behavior: lib/src/phy/mimo/precoding.c (codebook + predecoding;
the reference stops at 2x2 SM — rank-4 is an extension for peak rate),
pbch.c/pcfich.c/phich.c/pdcch.c 4-port SFBC-FSTD paths.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.common.params import CP, Cell
from srslte_tpu.phy.mimo.mimo import (_W4, codebook_4port, mmse_sm_4port,
                                      precode_sm_4port)
from srslte_tpu.phy.phch.ra import DlGrant


def test_householder_codebook_unitary():
    for n in range(16):
        w = _W4[n]
        assert np.allclose(w @ w.conj().T, np.eye(4), atol=1e-6)
    for nl in (1, 2, 3, 4):
        for pmi in range(16):
            w = codebook_4port(pmi, nl)
            assert w.shape == (4, nl)
            # columns orthonormal up to the 1/sqrt(nl) power scale
            assert np.allclose(w.conj().T @ w, np.eye(nl) / nl, atol=1e-6)


@pytest.mark.parametrize("pmi", [None, 0, 5, 11, 15])
def test_precode_mmse_4x4_recovers_layers(pmi):
    rng = np.random.default_rng(2)
    n = 96
    x = ((rng.integers(0, 2, (4, n)) * 2 - 1)
         + 1j * (rng.integers(0, 2, (4, n)) * 2 - 1)) / np.sqrt(2)
    x = jnp.asarray(x.astype(np.complex64))
    ports = precode_sm_4port(x, pmi)
    assert ports.shape == (4, n)
    # well-conditioned random 4x4 channel, constant over REs
    H = (rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))) \
        / np.sqrt(2) + 2 * np.eye(4)
    y = jnp.einsum("rp,pn->rn", jnp.asarray(H.astype(np.complex64)), ports)
    h = jnp.broadcast_to(jnp.asarray(H.astype(np.complex64))[:, :, None],
                         (4, 4, n))
    xhat, gain = mmse_sm_4port(y, h, 1e-5, pmi, n_layers=4)
    assert np.allclose(np.asarray(xhat), np.asarray(x), atol=0.05)
    assert (np.asarray(gain) > 0).all()


@pytest.mark.parametrize("pmi", [None, 0])
def test_pdsch_sm4_dual_tb_roundtrip(pmi):
    """2 codewords on 4 layers through PdschSm4 (each CW = 2 * n_re syms)."""
    from srslte_tpu.phy.phch.pdsch import PdschSm4

    cell = Cell(n_prb=15, id=5, nof_ports=4)
    g0 = DlGrant.full(15, mcs=12)
    g1 = DlGrant.full(15, mcs=7)
    p = PdschSm4(cell, g0, sf_idx=2, cfi=2, rnti=0x61, pmi=pmi, grant1=g1)
    # TBS from the doubled G: cfg uses 2 * n_re * Qm
    assert p.cfg_q(0).G == 2 * p.cfg_q(0).G // 2
    rng = np.random.default_rng(4)
    b0 = jnp.asarray(rng.integers(0, 2, g0.tbs).astype(np.float32))
    b1 = jnp.asarray(rng.integers(0, 2, g1.tbs).astype(np.float32))
    o = cell.ofdm
    grids = jnp.zeros((4, o.nsymb_sf, o.nof_re), np.complex64)
    tx = p.encode2(b0, b1, grids)
    # near-identity 4x4 channel with light coupling
    rng2 = np.random.default_rng(9)
    H = np.eye(4) + 0.1 * (rng2.standard_normal((4, 4))
                           + 1j * rng2.standard_normal((4, 4)))
    H = H.astype(np.complex64)
    rx = jnp.einsum("rp,psk->rsk", jnp.asarray(H), tx)
    ce = jnp.broadcast_to(
        jnp.asarray(H)[:, :, None, None],
        (4, 4, o.nsymb_sf, o.nof_re)).astype(jnp.complex64)
    (o0, ok0), (o1, ok1) = p.decode2(rx, ce, 1e-4)
    assert bool(ok0) and bool(ok1)
    assert np.array_equal(np.asarray(o0), np.asarray(b0))
    assert np.array_equal(np.asarray(o1), np.asarray(b1))


def _ideal_rx(cell, grids, seed=0, noise=0.005):
    """Sum ports over a per-port flat channel; returns (grid_rx, ce)."""
    o = cell.ofdm
    rng = np.random.default_rng(seed)
    h = (np.array([1.0, 0.9, 0.8, 0.85])[: cell.nof_ports]
         * np.exp(1j * rng.uniform(0, 2 * np.pi, cell.nof_ports))
         ).astype(np.complex64)
    rx = jnp.einsum("p,psk->sk", jnp.asarray(h), grids)
    rx = rx + noise * jnp.asarray(
        rng.standard_normal(rx.shape) + 1j * rng.standard_normal(rx.shape),
        dtype=jnp.complex64)
    ce = jnp.broadcast_to(jnp.asarray(h)[:, None, None],
                          (cell.nof_ports, o.nsymb_sf, o.nof_re))
    return rx, ce.astype(jnp.complex64)


def test_pcfich_phich_pdcch_4port_roundtrip():
    from srslte_tpu.phy.phch.dci import Dci1A, pack_format1a, unpack_format1a
    from srslte_tpu.phy.phch.pcfich import Pcfich
    from srslte_tpu.phy.phch.pdcch import Pdcch, ue_locations
    from srslte_tpu.phy.phch.phich import Phich

    cell = Cell(n_prb=25, id=11, nof_ports=4)
    sf_idx, cfi, rnti = 3, 2, 0x4D2
    o = cell.ofdm
    grids = jnp.zeros((4, o.nsymb_sf, o.nof_re), np.complex64)
    grids = Pcfich(cell, sf_idx).encode(grids, cfi)
    ph = Phich(cell, sf_idx)
    ack = jnp.full(ph.re_idx.shape[:1] + (8,), -1, jnp.int32)
    ack = ack.at[0, 2].set(1)
    grids = ph.encode(grids, ack)
    pd = Pdcch(cell, cfi, sf_idx)
    loc = [l for l in ue_locations(pd.n_cce, rnti, sf_idx) if l.L == 4][0]
    dci = Dci1A(rb_start=2, l_crb=8, mcs=9)
    payload = pack_format1a(dci, 25)
    grids = pd.encode(grids, jnp.asarray(payload), rnti, loc)

    rx, ce = _ideal_rx(cell, grids)
    cfi_hat, conf = Pcfich(cell, sf_idx).decode(rx, ce)
    assert int(cfi_hat) == cfi and float(conf) > 0.5
    acks, metric = ph.decode(rx, ce)
    assert bool(np.asarray(acks)[0, 2])
    hits = pd.search(rx, ce, rnti, len(payload))
    assert any(l == loc and unpack_format1a(b, 25) == dci for l, b in hits)


@pytest.mark.parametrize("cp", [CP.NORM, CP.EXT])
def test_pbch_4port_and_ext_cp_roundtrip(cp):
    from srslte_tpu.phy.phch.pbch import Mib, Pbch

    cell = Cell(n_prb=50, id=17, nof_ports=4, cp=cp)
    o = cell.ofdm
    mib = Mib(n_prb=50, phich_length="norm", phich_resources="1", sfn=8)
    pb = Pbch(cell)
    grids = jnp.zeros((4, o.nsymb_sf, o.nof_re), np.complex64)
    grids = pb.encode_frame(mib, grids)
    rx, ce = _ideal_rx(cell, grids, noise=0.01)
    ok, bits, phase, ports = pb.decode(rx, ce)
    assert ok and ports == 4 and phase == 0
    got = Mib.unpack(bits)
    assert got.n_prb == 50 and got.sfn == 8

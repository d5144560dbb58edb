"""PUCCH tests — analog of lib/src/phy/phch/test/pucch_test.c: encode each
format into the UL grid, decode back through SC-FDMA + channel."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.common.params import Cell
from srslte_tpu.phy.ofdm import Ofdm
from srslte_tpu.phy.phch.pucch import (Pucch, PucchConfig, pucch_prb,
                                       rm20_encode)


def _roundtrip(cell, pucch, snr_db=20.0, seed=0, **enc):
    """encode -> SC-FDMA -> AWGN -> SC-FDMA demod -> grid."""
    rng = np.random.default_rng(seed)
    tx = Ofdm(cell.ofdm, normalize=True, freq_shift=0.5)
    rx = Ofdm(cell.ofdm, normalize=True, freq_shift=-0.5)
    g = pucch.encode(**enc)
    s = np.asarray(tx.tx_sf(g))
    h = 0.9 * np.exp(1j * 0.8)
    sig = np.mean(np.abs(s) ** 2) * abs(h) ** 2
    sigma = np.sqrt(sig / 10 ** (snr_db / 10) / 2)
    noisy = h * s + sigma * (rng.standard_normal(s.shape)
                             + 1j * rng.standard_normal(s.shape))
    return rx.rx_sf(jnp.asarray(noisy.astype(np.complex64)))


def test_rm20_linearity_and_distance():
    z = rm20_encode(np.zeros(4, np.uint8))
    assert not z.any()
    cws = [rm20_encode(np.array([(i >> k) & 1 for k in range(4)], np.uint8))
           for i in range(16)]
    dmin = min(np.sum(a != b) for i, a in enumerate(cws)
               for b in cws[i + 1 :])
    assert dmin >= 6  # RM(20,4) minimum distance


def test_pucch_prb_slot_hopping():
    cell = Cell(n_prb=25, id=7)
    cfg = PucchConfig("1a", n_pucch=3)
    p0 = pucch_prb(cell, cfg, 0)
    p1 = pucch_prb(cell, cfg, 1)
    assert p0 + p1 == cell.n_prb - 1  # mirrored across the band


@pytest.mark.parametrize("bits", [(0,), (1,)])
def test_pucch_format1a_roundtrip(bits):
    cell = Cell(n_prb=25, id=77)
    pucch = Pucch(cell, PucchConfig("1a", n_pucch=11), sf_idx=3)
    grid = _roundtrip(cell, pucch, ack_bits=bits, seed=sum(bits))
    out = pucch.decode(grid)
    assert tuple(np.asarray(out["ack"])) == bits
    assert float(np.asarray(out["metric"])) > 0.5


@pytest.mark.parametrize("bits", [(0, 0), (0, 1), (1, 0), (1, 1)])
def test_pucch_format1b_roundtrip(bits):
    cell = Cell(n_prb=6, id=13)
    pucch = Pucch(cell, PucchConfig("1b", n_pucch=0), sf_idx=8)
    grid = _roundtrip(cell, pucch, ack_bits=bits, seed=bits[0] * 2 + bits[1])
    out = pucch.decode(grid)
    assert tuple(np.asarray(out["ack"])) == bits


def test_pucch_format1_resources_orthogonal():
    """Two UEs on different n_pucch in the same PRB must not collide."""
    cell = Cell(n_prb=25, id=5)
    p_a = Pucch(cell, PucchConfig("1a", n_pucch=0), sf_idx=2)
    p_b = Pucch(cell, PucchConfig("1a", n_pucch=1), sf_idx=2)
    g = p_a.encode(ack_bits=(1,))
    g = p_b.encode(ack_bits=(0,), grid=g)
    out_a = p_a.decode(g)
    out_b = p_b.decode(g)
    assert tuple(np.asarray(out_a["ack"])) == (1,)
    assert tuple(np.asarray(out_b["ack"])) == (0,)


@pytest.mark.parametrize("a", [4, 7, 11])
def test_pucch_format2_cqi_roundtrip(a):
    rng = np.random.default_rng(a)
    cell = Cell(n_prb=25, id=91)
    pucch = Pucch(cell, PucchConfig("2", n_pucch=5), sf_idx=1, rnti=0x3C)
    cqi = tuple(rng.integers(0, 2, a).tolist())
    grid = _roundtrip(cell, pucch, cqi_bits=cqi, seed=a)
    out = pucch.decode(grid, nof_cqi_bits=a)
    assert tuple(np.asarray(out["cqi"])) == cqi


def test_pucch_format2b_cqi_plus_ack():
    cell = Cell(n_prb=50, id=17)
    pucch = Pucch(cell, PucchConfig("2b", n_pucch=20), sf_idx=6, rnti=0x99)
    cqi = (1, 0, 1, 1)
    grid = _roundtrip(cell, pucch, cqi_bits=cqi, ack_bits=(1, 0), seed=3)
    out = pucch.decode(grid, nof_cqi_bits=4)
    assert tuple(np.asarray(out["cqi"])) == cqi
    assert tuple(np.asarray(out["ack"])) == (1, 0)


def test_srs_roundtrip():
    from srslte_tpu.phy.phch.srs import Srs, SrsConfig

    cell = Cell(n_prb=25, id=31)
    srs = Srs(cell, SrsConfig(m_srs=8, k0_prb=2, comb=1, n_srs_cs=3))
    tx = Ofdm(cell.ofdm, normalize=True, freq_shift=0.5)
    rx = Ofdm(cell.ofdm, normalize=True, freq_shift=-0.5)
    g = srs.encode(jnp.zeros((cell.ofdm.nsymb_sf, cell.ofdm.nof_re), jnp.complex64))
    s = np.asarray(tx.tx_sf(g))
    h_true = 0.7 * np.exp(1j * 1.1)
    rng = np.random.default_rng(0)
    noisy = h_true * s + 0.01 * (rng.standard_normal(s.shape)
                                 + 1j * rng.standard_normal(s.shape))
    grid = rx.rx_sf(jnp.asarray(noisy.astype(np.complex64)))
    h, noise, power = srs.estimate(grid)
    est = np.mean(np.asarray(h))
    assert abs(est - h_true) < 0.05
    assert float(np.asarray(noise)) < 1e-2


def test_cqi_reporting():
    from srslte_tpu.phy.phch.cqi import (CQI_TABLE, SubbandCqi, WidebandCqi,
                                         cqi_from_snr)

    assert cqi_from_snr(-10) == 0
    assert cqi_from_snr(0.3) == 4
    assert cqi_from_snr(30) == 15
    assert CQI_TABLE[15] == (6, 948)
    for r in (WidebandCqi(cqi=9), WidebandCqi(cqi=12, pmi=2, ri=1)):
        back = WidebandCqi.unpack(r.pack(), has_pmi=r.pmi is not None,
                                  has_ri=r.ri is not None)
        assert back == r
        assert len(r.pack()) == r.nof_bits()
    sb = SubbandCqi(wideband=11, subband_diff=(0, 2, 1, 3))
    assert SubbandCqi.unpack(sb.pack(), 4) == sb

    # CQI rides the RM(20,A) PUCCH format 2 path end to end
    cell = Cell(n_prb=25, id=91)
    pucch = Pucch(cell, PucchConfig("2", n_pucch=5), sf_idx=1, rnti=0x3C)
    rep = WidebandCqi(cqi=13)
    grid = _roundtrip(cell, pucch, cqi_bits=tuple(rep.pack().tolist()), seed=5)
    out = pucch.decode(grid, nof_cqi_bits=rep.nof_bits())
    assert WidebandCqi.unpack(np.asarray(out["cqi"])).cqi == 13


@pytest.mark.parametrize("nbits", [3, 11])
def test_pucch_format3_roundtrip(nbits):
    """Format 3: many-bit ACK payload through SC-FDMA + phase channel."""
    cell = Cell(n_prb=25, id=31)
    pucch = Pucch(cell, PucchConfig("3", n_pucch=7), sf_idx=4, rnti=0x1234)
    rng = np.random.default_rng(nbits)
    bits = tuple(rng.integers(0, 2, nbits).tolist())
    grid = _roundtrip(cell, pucch, ack_bits=bits, seed=nbits, snr_db=10.0)
    out = pucch.decode(grid, nof_ack3_bits=nbits)
    assert tuple(np.asarray(out["ack"])) == bits
    assert float(np.asarray(out["metric"])) > 0.3


def test_pucch_format3_occ_orthogonality():
    """Two format-3 users on the same PRB pair, separated only by the DFT-5
    OCC (n_pucch 0 vs 1): both decode through a superposed grid."""
    cell = Cell(n_prb=6, id=5)
    rng = np.random.default_rng(9)
    users = []
    for n in (0, 1):
        p = Pucch(cell, PucchConfig("3", n_pucch=n), sf_idx=2, rnti=100 + n)
        bits = tuple(rng.integers(0, 2, 6).tolist())
        users.append((p, bits))
    grid = users[0][0].encode(ack_bits=users[0][1])
    # superpose the second user's REs (same PRB, same symbols)
    grid = grid + users[1][0].encode(ack_bits=users[1][1])
    for p, bits in users:
        out = p.decode(grid, nof_ack3_bits=6)
        assert tuple(np.asarray(out["ack"])) == bits


def test_srs_bandwidth_tables():
    """36.211 tables 5.5.3.2-x: spot values + structural consistency."""
    from srslte_tpu.phy.phch.srs import (srs_bandwidth, srs_config_from_bw,
                                         srs_k0_prb)

    assert srs_bandwidth(25, 0, 0) == 36  # table -1, C_srs=0, B=0
    assert srs_bandwidth(50, 0, 0) == 48  # table -2
    assert srs_bandwidth(100, 0, 0) == 96  # table -4
    assert srs_bandwidth(100, 3, 7) == 4
    # k0 walks down the tree and stays within the cell band
    for n_rrc in range(6):
        k0 = srs_k0_prb(50, 2, 1, n_rrc)
        m = srs_bandwidth(50, 2, 1)
        assert 0 <= k0 and k0 + m <= 50
    # different n_rrc select different sub-bands (n_rrc is in 4-PRB units:
    # nb = floor(4*n_rrc/m_srs) mod N_b)
    assert srs_k0_prb(50, 2, 1, 0) != srs_k0_prb(50, 2, 1, 2)


def test_srs_frequency_hopping():
    """36.211 §5.5.3.2 Fb hopping (refsignal_ul.c srs_Fb / srs_k0_ue)."""
    from srslte_tpu.phy.phch.srs import (srs_bandwidth, srs_fb, srs_k0_prb,
                                         srs_send_tti, srs_toffset, t_srs)

    # 36.213 table 8.2-1 periodicity/offset
    assert [t_srs(i) for i in (0, 2, 7, 17, 37, 77, 157, 317)] == \
        [2, 5, 10, 20, 40, 80, 160, 320]
    assert srs_toffset(5) == 3 and srs_toffset(20) == 3
    assert srs_send_tti(7, 0) and srs_send_tti(7, 10)  # I=7: T=10, off=0
    assert srs_send_tti(8, 1) and not srs_send_tti(8, 10)  # I=8: off=1
    assert not srs_send_tti(7, 8)

    # oracle: the reference's srs_k0_ue loop (refsignal_ul.c:804-824)
    from srslte_tpu.phy.phch.srs import _bw_row, _bw_tables

    def k0_ref(n_prb, B, bw_cfg, n_rrc, b_hop, i_srs, tti):
        m_tab, nb_tab = _bw_tables()
        row = _bw_row(n_prb)
        k0 = (n_prb // 2 - m_tab[row][0][bw_cfg] // 2) * 12
        for b in range(B + 1):
            m_srs = int(m_tab[row][b][bw_cfg])
            m_sc = m_srs * 12 // 2
            if b <= b_hop:
                nb = (4 * n_rrc // m_srs) % int(nb_tab[row][b][bw_cfg])
            else:
                fb = srs_fb(n_prb, b, bw_cfg, b_hop, i_srs, tti)
                nb = (4 * n_rrc // m_srs + fb) % int(nb_tab[row][b][bw_cfg])
            k0 += 2 * m_sc * nb
        return k0 // 12

    n_prb, B, bw_cfg, b_hop, i_srs = 50, 2, 1, 0, 7  # T=10ms
    t = t_srs(i_srs)
    seen = set()
    for n in range(8):
        tti = n * t + srs_toffset(i_srs)
        k0 = srs_k0_prb(n_prb, B, bw_cfg, 1, b_hop=b_hop, i_srs=i_srs,
                        tti=tti)
        assert k0 == k0_ref(n_prb, B, bw_cfg, 1, b_hop, i_srs, tti)
        m = srs_bandwidth(n_prb, B, bw_cfg)
        assert 0 <= k0 and k0 + m <= n_prb
        seen.add(k0)
    assert len(seen) > 1  # the position actually hops
    # b_hop >= B disables hopping: static across time
    k0s = {srs_k0_prb(n_prb, B, bw_cfg, 1, b_hop=4, i_srs=i_srs, tti=tt)
           for tt in range(0, 80, t)}
    assert len(k0s) == 1


def test_srs_config_from_bw_roundtrip():
    """Table-derived config feeds the existing SRS gen/estimate chain."""
    from srslte_tpu.phy.phch.srs import Srs, srs_config_from_bw

    cell = Cell(n_prb=50, id=11)
    cfg = srs_config_from_bw(50, bw_cfg=1, b_srs=1, n_rrc=3, n_srs_cs=2)
    srs = Srs(cell, cfg)
    grid = srs.encode(jnp.zeros((cell.ofdm.nsymb_sf, cell.ofdm.nof_re),
                                jnp.complex64))
    h, noise, power = srs.estimate(0.7 * grid)
    assert np.allclose(np.asarray(h), 0.7, atol=1e-3)


# -- extended CP + shortened (SRS-colliding) subframes ----------------------

@pytest.mark.parametrize("bits", [(0,), (1,)])
def test_pucch_format1a_ext_cp(bits):
    from srslte_tpu.phy.common.params import CP

    cell = Cell(n_prb=25, id=77, cp=CP.EXT)
    pucch = Pucch(cell, PucchConfig("1a", n_pucch=11), sf_idx=3)
    grid = _roundtrip(cell, pucch, ack_bits=bits, seed=sum(bits))
    out = pucch.decode(grid)
    assert tuple(np.asarray(out["ack"])) == bits
    assert float(np.asarray(out["metric"])) > 0.5


def test_pucch_format1b_ext_cp_multiuser_occ():
    """Two ext-CP UEs on the same resource block separated by cyclic shift."""
    from srslte_tpu.phy.common.params import CP

    cell = Cell(n_prb=6, id=13, cp=CP.EXT)
    u1 = Pucch(cell, PucchConfig("1b", n_pucch=0), sf_idx=2)
    u2 = Pucch(cell, PucchConfig("1b", n_pucch=3), sf_idx=2)
    g = u1.encode(ack_bits=(1, 0))
    g = u2.encode(ack_bits=(0, 1), grid=g)
    rng = np.random.default_rng(1)
    tx = Ofdm(cell.ofdm, normalize=True, freq_shift=0.5)
    rx = Ofdm(cell.ofdm, normalize=True, freq_shift=-0.5)
    s = np.asarray(tx.tx_sf(g)) * 0.9
    s = s + 0.01 * (rng.standard_normal(s.shape)
                    + 1j * rng.standard_normal(s.shape))
    grid = rx.rx_sf(jnp.asarray(s.astype(np.complex64)))
    assert tuple(np.asarray(u1.decode(grid)["ack"])) == (1, 0)
    assert tuple(np.asarray(u2.decode(grid)["ack"])) == (0, 1)


def test_pucch_format2_ext_cp():
    from srslte_tpu.phy.common.params import CP

    cell = Cell(n_prb=25, id=9, cp=CP.EXT)
    cqi = (1, 0, 1, 1)
    pucch = Pucch(cell, PucchConfig("2", n_pucch=2, n_rb_2=1), sf_idx=1,
                  rnti=0x5BB)
    grid = _roundtrip(cell, pucch, cqi_bits=cqi, seed=4)
    out = pucch.decode(grid, nof_cqi_bits=len(cqi))
    assert tuple(np.asarray(out["cqi"])) == cqi


def test_pucch_format2a_ext_cp_rejected():
    from srslte_tpu.phy.common.params import CP

    cell = Cell(n_prb=25, id=9, cp=CP.EXT)
    with pytest.raises(ValueError):
        Pucch(cell, PucchConfig("2a", n_pucch=2), sf_idx=1)


@pytest.mark.parametrize("bits", [(1,), (0,)])
def test_pucch_format1a_shortened(bits):
    """SRS-colliding subframe: slot 1 spreads with the N_sf=3 OCC."""
    cell = Cell(n_prb=25, id=31)
    pucch = Pucch(cell, PucchConfig("1a", n_pucch=7), sf_idx=6,
                  shortened=True)
    g = pucch.encode(ack_bits=bits)
    # the dropped symbol (last of slot 1) must stay empty
    o = cell.ofdm
    from srslte_tpu.phy.phch.pucch import F1_DATA_SYMS, pucch_prb

    last = F1_DATA_SYMS[-1] + o.nsymb_slot
    prb1 = pucch_prb(cell, pucch.cfg, 2 * 6 + 1)
    assert not np.abs(np.asarray(g)[last, prb1 * 12 : prb1 * 12 + 12]).any()
    grid = _roundtrip(cell, pucch, ack_bits=bits, seed=3 + sum(bits))
    out = pucch.decode(grid)
    assert tuple(np.asarray(out["ack"])) == bits


def test_pucch_format3_shortened():
    """Format 3 in an SRS subframe: slot 1 uses the Walsh-4 spreading."""
    cell = Cell(n_prb=25, id=5)
    ack = (1, 0, 1, 1, 0)
    pucch = Pucch(cell, PucchConfig("3", n_pucch=4), sf_idx=3, rnti=0x77,
                  shortened=True)
    grid = _roundtrip(cell, pucch, ack_bits=ack, seed=9)
    out = pucch.decode(grid, nof_ack3_bits=len(ack))
    assert tuple(np.asarray(out["ack"])) == ack

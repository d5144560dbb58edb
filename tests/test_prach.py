"""PRACH tests — analog of lib/src/phy/phch/test/prach_test.c: generate every
preamble, detect it back (with delay + noise), assert index and timing."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.common.params import OfdmParams
from srslte_tpu.phy.phch.prach import PrachConfig, prach_detect, prach_gen


def test_preamble_lengths_format0():
    cfg = PrachConfig(OfdmParams(6))
    assert cfg.n_fft == 1536
    assert cfg.n_cp == 198
    assert cfg.n_seq == 1536
    s = prach_gen(cfg, 0)
    assert len(s) == cfg.n_total
    # CP is cyclic
    np.testing.assert_allclose(s[: cfg.n_cp], s[cfg.n_seq :], atol=1e-6)


def test_prach_detect_all_preambles_clean():
    cfg = PrachConfig(OfdmParams(6), root_seq_idx=0, zero_corr_cfg=7)  # ncs=38
    for idx in (0, 1, 21, 22, 63):
        s = prach_gen(cfg, idx)
        det, metric, toff = prach_detect(cfg, jnp.asarray(s))
        det = np.asarray(det)
        assert det[idx], (idx, np.asarray(metric)[idx])
        assert det.sum() == 1, np.where(det)[0]
        assert int(np.asarray(toff)[idx]) == 0


def test_prach_detect_with_delay_and_noise():
    rng = np.random.default_rng(3)
    cfg = PrachConfig(OfdmParams(6), zero_corr_cfg=7)
    idx, delay = 17, 30
    s = prach_gen(cfg, idx)
    x = np.zeros(cfg.n_total + 256, np.complex64)
    x[delay : delay + len(s)] = s
    x += 0.1 * (rng.standard_normal(len(x)) + 1j * rng.standard_normal(len(x)))
    det, metric, toff = prach_detect(cfg, jnp.asarray(x.astype(np.complex64)))
    det = np.asarray(det)
    assert det[idx]
    got = int(np.asarray(toff)[idx])
    assert abs(got - delay) <= 2, got


def test_prach_no_false_alarm_on_noise():
    rng = np.random.default_rng(5)
    cfg = PrachConfig(OfdmParams(6), zero_corr_cfg=7)
    x = (rng.standard_normal(cfg.n_total) + 1j * rng.standard_normal(cfg.n_total)
         ).astype(np.complex64)
    det, metric, _ = prach_detect(cfg, jnp.asarray(x))
    assert not np.asarray(det).any(), np.asarray(metric).max()


def test_prach_batched_windows():
    cfg = PrachConfig(OfdmParams(6), zero_corr_cfg=7)
    xs = np.stack([prach_gen(cfg, 3), prach_gen(cfg, 40)])
    det, _, _ = prach_detect(cfg, jnp.asarray(xs))
    det = np.asarray(det)
    assert det[0, 3] and det[1, 40]
    assert det.sum() == 2


def test_logical_root_table():
    from srslte_tpu.phy.phch.prach import logical_roots

    tab = logical_roots()
    assert len(tab) == 838
    assert sorted(tab.tolist()) == list(range(1, 839))
    # 36.211 table 5.7.2-4 starts 129, 710, 140, 699 (conjugate pairs)
    assert list(tab[:4]) == [129, 710, 140, 699]
    cfg = PrachConfig(OfdmParams(6), root_seq_idx=0, zero_corr_cfg=7)
    assert cfg.roots[0] == 129


def test_prach_restricted_shift_algebra():
    """Restricted-set shift counts follow the 36.211 §5.7.2 algebra."""
    from srslte_tpu.phy.phch.prach import NZC, d_u, restricted_shifts

    # d_u is the folded modular inverse
    for u in (1, 129, 710, 837):
        p = pow(u, -1, NZC)
        assert d_u(u) == (p if p < NZC // 2 else NZC - p)
    # all shifts are distinct, within [0, NZC), and spaced >= n_cs apart
    # in their group structure
    for u in (129, 140, 201, 400):
        cvs = restricted_shifts(u, 22)
        assert len(cvs) == len(set(cvs))
        assert all(0 <= c < NZC for c in cvs)


def test_prach_restricted_detects_all_preambles():
    """High-speed config: every preamble round-trips through gen+detect."""
    p = OfdmParams(25)
    cfg = PrachConfig(p, root_seq_idx=22, zero_corr_cfg=4, high_speed=True)
    assert len(cfg.preamble_table) == 64
    for idx in (0, 17, 40, 63):
        s = prach_gen(cfg, idx)
        det, metric, toff = prach_detect(cfg, jnp.asarray(s))
        det = np.asarray(det)
        assert det[idx], np.asarray(metric)[idx]
        assert int(np.asarray(toff)[idx]) == 0


def test_prach_restricted_doppler_alias_detected():
    """A one-subcarrier Doppler shift moves the peak to the +-d_u alias
    window: restricted detection must still fire, unrestricted would not
    find it in the main window."""
    p = OfdmParams(25)
    cfg = PrachConfig(p, root_seq_idx=22, zero_corr_cfg=4, high_speed=True)
    idx = 5
    s = prach_gen(cfg, idx)
    # apply +1.25 kHz (one RA subcarrier) Doppler
    t = np.arange(len(s)) / cfg.srate
    s_dopp = (np.asarray(s) * np.exp(2j * np.pi * 1250 * t)).astype(np.complex64)
    det, metric, _ = prach_detect(cfg, jnp.asarray(s_dopp))
    assert np.asarray(det)[idx]


def test_prach_restricted_noise_no_false_alarm():
    rng = np.random.default_rng(3)
    p = OfdmParams(25)
    cfg = PrachConfig(p, root_seq_idx=22, zero_corr_cfg=4, high_speed=True)
    x = 0.1 * (rng.standard_normal(cfg.n_total)
               + 1j * rng.standard_normal(cfg.n_total)).astype(np.complex64)
    det, _, _ = prach_detect(cfg, jnp.asarray(x))
    assert not np.asarray(det).any()


def test_prach_format4_roundtrip():
    """Short UpPTS preamble (N_zc=139, 7.5 kHz): gen + detect + timing."""
    p = OfdmParams(25)
    cfg = PrachConfig(p, root_seq_idx=3, zero_corr_cfg=2, fmt=4)
    assert cfg.nzc == 139 and cfg.n_seq == 4096 * p.srate // 30_720_000
    for idx in (0, 13, 63):
        s = prach_gen(cfg, idx)
        assert len(s) == cfg.n_total
        det, metric, toff = prach_detect(cfg, jnp.asarray(s))
        det = np.asarray(det)
        assert det[idx]
        assert int(np.asarray(toff)[idx]) == 0
        # no other preamble of a different root/shift fires
        others = np.flatnonzero(det)
        assert all(cfg.preamble_table[int(o)] == cfg.preamble_table[idx]
                   for o in others)


def test_prach_format4_delay_and_noise():
    rng = np.random.default_rng(8)
    p = OfdmParams(50)
    cfg = PrachConfig(p, root_seq_idx=70, zero_corr_cfg=4, fmt=4)
    delay = 9
    s = np.asarray(prach_gen(cfg, 31))
    x = np.concatenate([np.zeros(delay, np.complex64), s])[: cfg.n_total]
    x = x + 0.05 * (rng.standard_normal(len(x))
                    + 1j * rng.standard_normal(len(x))).astype(np.complex64)
    det, metric, toff = prach_detect(cfg, jnp.asarray(x.astype(np.complex64)))
    assert np.asarray(det)[31]
    # timing resolution is one correlation lag = n_fft/139 samples
    assert abs(int(np.asarray(toff)[31]) - delay) <= cfg.n_fft // cfg.nzc + 1

"""Channel emulator / resampling / io / agc tests.

Analog of lib/src/phy/channel/test and io tests: statistical checks on the
impairments plus a full PDSCH-over-fading decode (SURVEY.md §7 warns halo
bugs pass AWGN but fail fading — this is that gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.agc import Agc
from srslte_tpu.phy.channel import (PROFILES, FadingChannel, awgn,
                                    fractional_delay, rlf_mask)
from srslte_tpu.phy.io import FileSink, FileSource
from srslte_tpu.phy.resampling import interp_linear_cf, resample_fft


def test_awgn_snr():
    key = jax.random.PRNGKey(0)
    x = jnp.ones(100_000, jnp.complex64)
    y = awgn(key, x, 10.0)
    noise = np.asarray(y) - 1.0
    snr = 1.0 / np.mean(np.abs(noise) ** 2)
    assert abs(10 * np.log10(snr) - 10.0) < 0.3


def test_fractional_delay_integer_matches_roll():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    y = np.asarray(fractional_delay(jnp.asarray(x), 7))
    np.testing.assert_allclose(y, np.roll(x, 7), atol=1e-4)


def test_rlf_mask_duty_cycle():
    m = np.asarray(rlf_mask(10_000, 10_000, t_on_ms=800.0, t_off_ms=200.0))
    assert abs(m.mean() - 0.8) < 0.01


@pytest.mark.parametrize("profile", ["epa", "eva", "etu"])
def test_fading_power_and_rayleigh(profile):
    x = jnp.ones(64 * 2048, jnp.complex64)
    powers, cvs = [], []
    for seed in range(4):
        ch = FadingChannel(profile, doppler_hz=300.0, srate=1_920_000, seed=seed)
        y = np.asarray(ch(x))
        powers.append(np.mean(np.abs(y) ** 2))
        env = np.abs(y.reshape(-1, 2048)).mean(axis=1)
        cvs.append(env.std() / env.mean())
    # unit average power (tap powers normalized; Rayleigh realizations vary)
    assert abs(np.mean(powers) - 1.0) < 0.4, powers
    # time-varying envelope (Doppler)
    assert np.mean(cvs) > 0.1


def test_fading_static_is_lti():
    ch = FadingChannel("epa", doppler_hz=0.0, srate=1_920_000, seed=2)
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(8192) + 1j * rng.standard_normal(8192)).astype(np.complex64)
    y1 = np.asarray(ch(jnp.asarray(x)))
    y2 = np.asarray(ch(jnp.asarray(np.roll(x, 2048))))
    # block boundary correctness: shifted input -> shifted output
    np.testing.assert_allclose(y2[4096:6144], np.roll(y1, 2048)[4096:6144],
                               atol=1e-3)


def test_pdsch_over_etu_fading():
    """The halo gate: full DL chain through a delay-spread channel."""
    from srslte_tpu.phy.common.params import Cell
    from srslte_tpu.phy.enb.enb_dl import EnbDl
    from srslte_tpu.phy.phch.pdsch import Pdsch
    from srslte_tpu.phy.phch.ra import DlGrant
    from srslte_tpu.phy.ue.ue_dl import UeDl

    cell = Cell(n_prb=25, id=9)
    grant = DlGrant.full(25, 6)  # QPSK, robust
    pdsch = Pdsch(cell, grant, sf_idx=4, rnti=0x10)
    enb, ue = EnbDl(cell), UeDl(cell)
    rng = np.random.default_rng(11)
    bits = rng.integers(0, 2, (grant.tbs,)).astype(np.uint8)
    g = enb.put_base(enb.empty_grids(), 4)
    g = enb.put_pdsch(g, pdsch, jnp.asarray(bits))
    s = enb.gen_signal(g)[..., 0, :]
    ch = FadingChannel("etu", doppler_hz=5.0, srate=cell.ofdm.srate, seed=4)
    faded = ch(s)
    noisy = awgn(jax.random.PRNGKey(7), faded, 20.0)
    out, ok, info = ue.decode_pdsch(noisy, pdsch)
    assert bool(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(out), bits)


def test_resample_fft_roundtrip():
    rng = np.random.default_rng(1)
    # bandlimited signal: random spectrum limited to 1/4 band
    n = 1920
    xf = np.zeros(n, np.complex64)
    xf[: n // 8] = rng.standard_normal(n // 8) + 1j * rng.standard_normal(n // 8)
    xf[-n // 8 :] = rng.standard_normal(n // 8) + 1j * rng.standard_normal(n // 8)
    x = np.fft.ifft(xf).astype(np.complex64)
    up = np.asarray(resample_fft(jnp.asarray(x), 2, 1))
    assert len(up) == 2 * n
    down = np.asarray(resample_fft(jnp.asarray(up), 1, 2))
    np.testing.assert_allclose(down, x, atol=1e-5)
    # 1.92M -> 23.04M (the ZMQ base-rate ratio 12) and back
    up12 = np.asarray(resample_fft(jnp.asarray(x), 12, 1))
    back = np.asarray(resample_fft(jnp.asarray(up12), 1, 12))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_interp_linear():
    x = jnp.asarray(np.array([0, 2, 4], np.complex64))
    y = np.asarray(interp_linear_cf(x, 2))
    np.testing.assert_allclose(y.real, [0, 1, 2, 3, 4, 4], atol=1e-6)


def test_file_source_sink_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = 0.2 * (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64)
    for fmt, atol in [("complex_float_bin", 1e-7), ("complex_short_bin", 1e-3)]:
        p = str(tmp_path / f"s.{fmt}")
        sink = FileSink(p, fmt)
        sink.write(x)
        sink.close()
        src = FileSource(p, fmt)
        y = src.read(1000)
        assert len(src.read(10)) == 0  # EOF
        src.close()
        np.testing.assert_allclose(y, x, atol=atol)


def test_agc_converges():
    rng = np.random.default_rng(3)
    x = 0.01 * (rng.standard_normal(32 * 1024) + 1j * rng.standard_normal(32 * 1024))
    agc = Agc(target=0.3)
    y, gains, rssi = agc.process(jnp.asarray(x.astype(np.complex64)), 1024)
    final_rms = np.sqrt(np.mean(np.abs(np.asarray(y)[-4096:]) ** 2))
    assert abs(final_rms - 0.3) / 0.3 < 0.15


def test_block_code_roundtrip():
    from srslte_tpu.phy.fec.block import block_decode, block_encode

    rng = np.random.default_rng(7)
    for k in (1, 4, 8, 11):
        bits = rng.integers(0, 2, k).astype(np.uint8)
        for e in (32, 20, 64):
            cw = block_encode(bits, e)
            assert cw.shape[-1] == e
            llr = (2.0 * cw - 1.0) * 3 + rng.standard_normal(e).astype(np.float32)
            out, metric = block_decode(jnp.asarray(llr.astype(np.float32)), k)
            np.testing.assert_array_equal(np.asarray(out), bits)


def test_hst_doppler_trajectory():
    from srslte_tpu.phy.channel.hst import apply_hst, hst_doppler

    # near the eNB crossing the Doppler flips sign
    t = np.array([0.0, 1.79, 1.81, 3.5])
    f = hst_doppler(t, f_d=750.0, ds=300.0, d_min=2.0, v=300.0)
    assert f[0] > 700  # approaching: near +f_d
    assert f[1] > 0 > f[2] or f[1] * f[2] < 0  # sign change at crossing
    x = jnp.ones(2048, jnp.complex64)
    y = np.asarray(apply_hst(x, 1_920_000, 750.0))
    assert np.allclose(np.abs(y), 1.0, atol=1e-5)
    assert not np.allclose(y, 1.0)  # actually rotating


def _resample_arb_oracle(x, rate, interpolate=False):
    """Pure-numpy port of the reference streaming loop (resample_arb.c
    srsran_resample_arb_compute) as the exactness oracle."""
    from srslte_tpu.phy.resampling.resampler import ARB_M, ARB_N, _arb_polyfilt

    bank = _arb_polyfilt()
    step = ARB_N / rate
    acc, idx, cnt = 0.0, 0, 0
    frac = 0.0
    out = []
    n_in = len(x)
    xp = np.concatenate([np.zeros(ARB_M, x.dtype), x])
    while cnt < n_in:
        w = xp[cnt : cnt + ARB_M]
        r1 = np.dot(w, bank[idx])
        if interpolate:
            r2 = np.dot(w, bank[(idx + 1) % ARB_N])
            out.append(r1 + (r2 - r1) * frac)
        else:
            out.append(r1)
        acc += step
        idx = int(acc)
        while idx >= ARB_N:
            acc -= ARB_N
            idx -= ARB_N
            cnt += 1
        frac = abs(acc - idx)
    return np.asarray(out, x.dtype)


@pytest.mark.parametrize("rate,interp", [(0.7, False), (1.25, True),
                                         (23.04 / 30.72, True)])
def test_resample_arb_matches_reference_loop(rate, interp):
    from srslte_tpu.phy.resampling import resample_arb

    rng = np.random.default_rng(3)
    n = 400
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(resample_arb(jnp.asarray(x), rate, interpolate=interp))
    want = _resample_arb_oracle(x, rate, interp)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_resample_arb_tone_fidelity():
    """A bandlimited tone survives an irrational-ish ratio with low EVM."""
    from srslte_tpu.phy.resampling import resample_arb

    rate = 0.876543
    n = 4096
    f = 0.02  # cycles/sample, well inside the filter passband
    t = np.arange(n)
    x = np.exp(2j * np.pi * f * t).astype(np.complex64)
    y = np.asarray(resample_arb(jnp.asarray(x), rate, interpolate=True))
    # expected tone at f/rate cycles/output-sample; skip filter edges
    m = len(y)
    ty = np.arange(m)
    ref = np.exp(2j * np.pi * (f / rate) * ty)
    core_y, core_r = y[ARB_GUARD:-ARB_GUARD], ref[ARB_GUARD:-ARB_GUARD]
    # align constant phase/delay via single complex gain
    g = np.vdot(core_r, core_y) / np.vdot(core_r, core_r)
    evm = np.linalg.norm(core_y - g * core_r) / np.linalg.norm(core_y)
    assert evm < 0.02, evm


ARB_GUARD = 32

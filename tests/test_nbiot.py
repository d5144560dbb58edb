"""NB-IoT sync tests (npss.c / nsss.c analogs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.nbiot import npss_find, npss_sequence, nsss_find, nsss_sequence
from srslte_tpu.phy.nbiot.sync import npss_time


def test_npss_sequence_structure():
    s = npss_sequence()
    assert s.shape == (11, 11)
    np.testing.assert_allclose(np.abs(s), 1.0, atol=1e-6)
    # cover code flips symbol signs
    np.testing.assert_allclose(s[4], -s[0], atol=1e-6)


def test_npss_detection_with_delay_noise():
    rng = np.random.default_rng(0)
    rep = npss_time()
    delay = 1911
    x = 0.1 * (rng.standard_normal(6000) + 1j * rng.standard_normal(6000))
    x[delay : delay + len(rep)] += 4.0 * rep
    off, metric = npss_find(jnp.asarray(x.astype(np.complex64)))
    assert abs(int(off) - delay) <= 1
    # unit-energy replica vs ~1500-sample window noise: modest norm. metric
    assert float(metric) > 0.1


@pytest.mark.parametrize("nid,fpos", [(0, 0), (257, 3), (503, 1)])
def test_nsss_detection(nid, fpos):
    rng = np.random.default_rng(nid)
    d = nsss_sequence(nid, fpos)
    rx = d * 0.8 * np.exp(0.7j) + 0.2 * (
        rng.standard_normal(132) + 1j * rng.standard_normal(132))
    got_id, got_f, metric = nsss_find(jnp.asarray(rx.astype(np.complex64)))
    assert int(got_id) == nid
    assert int(got_f) == fpos
    assert float(metric) > 0.3

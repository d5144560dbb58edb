"""BLER acceptance gates — the reference's CTest criteria reproduced.

lib/src/phy/fec/turbo/test/CMakeLists.txt:45-48 gates the turbo decoder at
ZERO residual errors over 100 AWGN trials at Eb/N0 1.0-2.0 dB for code
blocks 504 and 6144 (rate 1/3, 5.5 iterations).  Here the 100 trials run as
ONE batched device dispatch (BASELINE.md: BLER-vs-SNR parity metric).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.fec.tdec import turbo_decode
from srslte_tpu.phy.fec.turbo import turbo_encode_np


def _turbo_trials(k: int, ebno_db: float, n_trials: int, seed: int):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (n_trials, k)).astype(np.uint8)
    d = turbo_encode_np(bits).astype(np.float32)
    rate = k / d.shape[-1]
    sigma = np.sqrt(1.0 / (2.0 * rate * 10 ** (ebno_db / 10)))
    llr = (2 * d - 1) + sigma * rng.standard_normal(d.shape).astype(np.float32)
    hard, _ = turbo_decode(jnp.asarray(llr), k, n_iter=6)
    errs = (np.asarray(hard) != bits).any(axis=1).sum()
    return int(errs)


@pytest.mark.parametrize("k,ebno", [(6144, 1.5), (504, 2.0)])
def test_turbo_bler_gate(k, ebno):
    """Reference gate: 0 block errors / 100 trials at the given Eb/N0."""
    assert _turbo_trials(k, ebno, 100, seed=k) == 0


def test_turbo_fails_well_below_threshold():
    """Sanity: far below the waterfall the decoder must NOT pass (the gate
    would be meaningless if noise never mattered)."""
    assert _turbo_trials(1024, -2.0, 20, seed=1) > 0


def test_ldpc_bler_gate():
    """BG1 rate-1/3-ish at 2 dB: zero errors over 50 trials."""
    from srslte_tpu.phy.fec.ldpc import LdpcGraph, ldpc_decode, ldpc_encode

    g = LdpcGraph(1, 64)
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (50, g.k)).astype(np.uint8)
    cw = np.asarray(ldpc_encode(jnp.asarray(bits), g)).astype(np.float32)
    rate = g.k / (g.n_full - 2 * g.zc)
    sigma = np.sqrt(1.0 / (2.0 * rate * 10 ** (2.0 / 10)))
    llr = (2 * cw - 1) + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr[:, : 2 * g.zc] = 0.0
    out, ok = ldpc_decode(jnp.asarray(llr), g, n_iter=12)
    errs = (np.asarray(out) != bits).any(axis=1).sum()
    assert errs == 0, errs

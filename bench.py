"""Headline benchmark — prints ONE JSON line.

Metric: baseband Msamples/s/chip through the heaviest currently-built DL chain
(BASELINE.md: reference real-time requirement is 30.72 Msamples/s at 100 PRB;
vs_baseline = measured / 30.72).  The chain under test grows as the framework
grows; it is always the flagship end-to-end path, not a microkernel.

Boundary discipline: the axon TPU backend cannot transfer complex64 between
host and device, so all host<->device traffic is float32 with a trailing
(..., 2) real/imag axis; complex lives only inside jit.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REALTIME_MSPS = 30.72  # 100 PRB real-time rate (phy_common.c:332-339)


def main():
    from srslte_tpu.phy.common.params import OfdmParams
    from srslte_tpu.phy.ofdm import Ofdm

    p = OfdmParams(100)
    modem = Ofdm(p, normalize=True)
    batch = 32  # subframes per dispatch

    @jax.jit
    def chain(samples2):
        samples = jax.lax.complex(samples2[..., 0], samples2[..., 1])
        grid = modem.rx_sf(samples)  # demod
        out = modem.tx_sf(grid)  # remod (placeholder for full DL chain)
        return jnp.stack([out.real, out.imag], axis=-1)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, p.sf_len, 2)).astype(np.float32))

    chain(x).block_until_ready()  # compile
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        x = chain(x)
    x.block_until_ready()
    dt = time.perf_counter() - t0

    msps = batch * p.sf_len * n_iter / dt / 1e6
    print(json.dumps({
        "metric": "ofdm_rx_tx_100prb",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / REALTIME_MSPS, 2),
    }))


if __name__ == "__main__":
    main()

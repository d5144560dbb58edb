"""Standalone eNB process (srsenb analog — test/run_lte.sh topology).

Virtual RF over the native UDP sample pipe, lockstepped with the UE
process: we wait for the UE's one-subframe "hello", then per TTI transmit
the DL subframe and block for exactly one UL subframe, keeping the
byte-stream ring sample-aligned.  S1 toward the EPC process over the S1AP
association; user plane over GTP-U.

Usage: python run_enb.py <s1_port> [dl_port=2101] [ul_port=2100]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from srslte_tpu.enb import EnbApp  # noqa: E402
from srslte_tpu.phy.common.params import Cell  # noqa: E402
from srslte_tpu.runtime import SamplePipeRx, SamplePipeTx  # noqa: E402
from srslte_tpu.utils import crash  # noqa: E402

crash.install()


def main():
    s1_port = int(sys.argv[1])
    dl_port = int(sys.argv[2]) if len(sys.argv) > 2 else 2101
    ul_port = int(sys.argv[3]) if len(sys.argv) > 3 else 2100
    rx = SamplePipeRx(ul_port)  # bind first so the UE hello is never lost
    tx = SamplePipeTx("127.0.0.1", dl_port)
    cell = Cell(n_prb=15, id=1, nof_ports=1)
    enb = EnbApp(cell, s1={"port": s1_port, "force_tcp": True})
    sf_len = cell.ofdm.sf_len
    print("ENB ready", flush=True)
    hello = rx.read(sf_len, timeout_ms=300_000)
    if len(hello) < sf_len:
        print("NO_UE", flush=True)
        return
    tti = 0
    while True:
        tx.send(np.asarray(enb.tx_subframe(tti)).astype(np.complex64))
        # the UE jit-compiles its decode chain on the first subframes;
        # after that the lockstep answer arrives within a TTI of work
        ul = rx.read(sf_len, timeout_ms=300_000 if tti < 3 else 60_000)
        if len(ul) < sf_len:  # UE gone: keep serving silence
            enb.rx_subframe(None, tti)
        else:
            enb.rx_subframe(ul, tti)
        tti += 1


if __name__ == "__main__":
    main()

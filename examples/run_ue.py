"""Standalone UE process (srsue analog — test/run_lte.sh topology).

Lockstep virtual RF over the native UDP sample pipe: the UE announces
itself with one zero "hello" subframe, then for every DL subframe read it
answers with exactly one UL subframe (zeros when idle), so both ends stay
sample-aligned on the byte-stream ring.  After attach, sends one UL user
packet and waits for the EPC's SGi echo to come back down the DRB; prints
progress lines the three-process test asserts on.

Usage: python run_ue.py [dl_port=2101] [ul_port=2100]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

# The site profile may pin an experimental TPU platform; the process trio
# must share the host CPU (env JAX_PLATFORMS does not stick — see conftest).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from srslte_tpu.phy.common.params import Cell  # noqa: E402
from srslte_tpu.runtime import SamplePipeRx, SamplePipeTx  # noqa: E402
from srslte_tpu.security.milenage import compute_opc  # noqa: E402
from srslte_tpu.ue import UeApp  # noqa: E402
from srslte_tpu.ue_stack import SoftUsim, UeNas  # noqa: E402
from srslte_tpu.utils import crash  # noqa: E402

crash.install()

IMSI = "001010123456789"
K = bytes.fromhex("465b5ce8b199b49faa5f0a2ee238a6bc")
OP = bytes.fromhex("cdc202d5123e20f62b6d676ac72cb318")


def main():
    dl_port = int(sys.argv[1]) if len(sys.argv) > 1 else 2101
    ul_port = int(sys.argv[2]) if len(sys.argv) > 2 else 2100
    rx = SamplePipeRx(dl_port)  # bind before slow init so no DL is dropped
    tx = SamplePipeTx("127.0.0.1", ul_port)
    cell = Cell(n_prb=15, id=1, nof_ports=1)
    ue = UeApp(cell, UeNas(SoftUsim(IMSI, K, compute_opc(K, OP))))
    sf_len = cell.ofdm.sf_len
    tx.send(np.zeros(sf_len, np.complex64))  # hello: starts the eNB's loop
    print("UE ready", flush=True)
    tti = 0
    attached_at = -1
    sent = False
    while tti < 1500:
        # generous first-read budget: the eNB jit-compiles its DL chain
        # before subframe 0 arrives; later reads only wait on lockstep
        dl = rx.read(sf_len, timeout_ms=300_000 if tti == 0 else 60_000)
        if len(dl) < sf_len:
            print("DL_TIMEOUT", flush=True)
            break  # eNB gone
        ue.rx_subframe(dl, tti)
        ul = ue.tx_subframe(tti)
        tx.send(np.zeros(sf_len, np.complex64) if ul is None
                else np.asarray(ul).astype(np.complex64))
        if attached_at < 0 and ue.nas.state == "attached":
            attached_at = tti
            print(f"ATTACHED tti={tti} ip={ue.nas.ip}", flush=True)
        if attached_at >= 0 and not sent and tti >= attached_at + 30:
            ue.send_data(b"ping-3proc")
            sent = True
        if ue.rx_data:
            print(f"DL_DATA {ue.rx_data[0].decode(errors='replace')}",
                  flush=True)
            break
        tti += 1


if __name__ == "__main__":
    main()

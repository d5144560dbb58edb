"""NR data-plane stack over the slot workers: PDCP/RLC/MAC e2e.

Reference behavior: srsenb/src/stack/gnb_stack_nr.cc +
srsue/src/stack/ue_stack_nr.cc data path (PDCP -> RLC UM -> MAC mux ->
PHY slot -> demux -> reassembly -> PDCP rx).
"""

import jax.numpy as jnp
import numpy as np

from srslte_tpu.nr_stack import GnbNrStack, UeNrStack
from srslte_tpu.nr_worker import GnbNrWorker, NrWorkerCommon, UeNrWorker
from srslte_tpu.phy.nr import Coreset, NrCarrier

KEY = bytes(range(16))


def test_nr_stack_packets_over_slot_loop():
    """Ciphered packets (one spanning several RLC segments) ride the NR
    slot loop and come out intact and in order."""
    car = NrCarrier(n_prb=52, n_id=33)
    cs = Coreset.full(48, duration=1, id=1)
    common = NrWorkerCommon(carrier=car, coreset=cs, mcs=20)
    gnb_w = GnbNrWorker(common)
    ue_w = UeNrWorker(common)
    gnb = GnbNrStack(gnb_w, k_enc=KEY)
    ue = UeNrStack(ue_w, k_enc=KEY)
    tbs = common.phy_grant(0).tbs
    tb_bytes = tbs // 8
    rng = np.random.default_rng(3)
    pkts = [rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            for n in (120, 3 * tb_bytes // 2, 64)]  # middle one segments
    for p in pkts:
        gnb.send_packet(p)
    gnb.pump_tx()
    assert len(gnb_w.queue) >= 3  # the big packet needed an extra TB
    # clean channel at modest noise: data plane, not HARQ, under test
    sigma = 10 ** (-16.0 / 20) / np.sqrt(2)
    slots = 0
    while (gnb_w.queue or gnb_w._nacked or gnb_w._awaiting) and slots < 16:
        slot = slots % 2
        grid = gnb_w.tx_slot(slot)
        slots += 1
        if grid is None:
            continue
        g = np.asarray(grid)
        noisy = g + sigma * (rng.standard_normal(g.shape)
                             + 1j * rng.standard_normal(g.shape))
        ul = ue_w.rx_slot(jnp.asarray(noisy.astype(np.complex64)), slot)
        assert ul is not None
        gnb_w.rx_ul_slot(ul, slot)
        ue.pump_rx()
    assert gnb_w.dropped == 0
    assert ue.received == pkts
    # PDCP COUNT advanced once per packet and deciphered through NEA2
    assert ue.pdcp.rx_next == len(pkts)

"""RA procedure tests: msg1-4 over the real PRACH PHY (proc_ra.cc analog)."""

import jax.numpy as jnp
import numpy as np

from srslte_tpu.mac.ra import EnbRach, UeRaProc
from srslte_tpu.phy.common.params import OfdmParams
from srslte_tpu.phy.phch.prach import PrachConfig, prach_detect, prach_gen


def test_ra_msg1_to_msg4_over_phy():
    rng = np.random.default_rng(0)
    cfg = PrachConfig(OfdmParams(6), zero_corr_cfg=7)
    ue = UeRaProc()
    enb = EnbRach()

    # msg1: UE transmits the preamble on PRACH, eNB detects it
    pidx = ue.start(rng)
    delay = 11
    s = prach_gen(cfg, pidx)
    x = np.zeros(cfg.n_total + 64, np.complex64)
    x[delay : delay + len(s)] = s
    det, metric, toff = prach_detect(cfg, jnp.asarray(x))
    det = np.asarray(det)
    assert det[pidx]
    # msg2: RAR with TA from the detected timing
    rar = enb.rach_detected(np.where(det)[0].tolist(),
                            [int(np.asarray(toff)[pidx])])
    msg3 = ue.rx_rar(rar)
    assert msg3 is not None
    assert ue.state == "wait_conres"
    assert ue.ta == delay or abs(ue.ta - delay) <= 2
    # msg3 -> msg4: contention resolution
    msg4 = enb.rx_msg3(ue.temp_crnti, msg3.pack())
    assert msg4 is not None
    assert ue.rx_msg4(msg4)
    assert ue.state == "connected"
    assert ue.crnti == ue.temp_crnti


def test_ra_rar_window_expiry_retries():
    ue = UeRaProc(rar_window=3)
    ue.start(np.random.default_rng(1))
    for _ in range(4):
        ue.tick()
    assert ue.state == "idle"  # back off, ready for another attempt
    assert ue.attempt == 1


def test_ra_contention_lost():
    rng = np.random.default_rng(2)
    ue_a, ue_b = UeRaProc(), UeRaProc()
    enb = EnbRach()
    # both UEs pick the same preamble
    pa = ue_a.start(rng)
    ue_b.preamble, ue_b.state, ue_b.attempt = pa, "wait_rar", 1
    rar = enb.rach_detected([pa], [0])
    m3a = ue_a.rx_rar(rar)
    m3b = ue_b.rx_rar(rar)
    # eNB receives only UE A's msg3 (collision winner)
    msg4 = enb.rx_msg3(ue_a.temp_crnti, m3a.pack())
    assert ue_a.rx_msg4(msg4)
    assert not ue_b.rx_msg4(msg4)
    assert ue_b.state == "idle"  # lost contention, will retry

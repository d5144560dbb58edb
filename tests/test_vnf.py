"""VNF/PNF functional split: SF_IND -> DL_CONFIG/TX.request -> DL_IND flow.

Reference behavior: lib/src/common/basic_vnf.cc + basic_vnf_api.h message
exchange (PNF announces slots, VNF supplies the TB, UE side gets DL_IND).
"""

import numpy as np

from srslte_tpu import vnf
from srslte_tpu.nr_worker import GnbNrWorker, NrWorkerCommon, UeNrWorker
from srslte_tpu.phy.nr import Coreset, NrCarrier


def test_message_codecs_roundtrip():
    tti, pdus = vnf.unpack_tx_request(
        vnf.pack_tx_request(42, [(vnf.PDSCH, b"hello"),
                                 (vnf.PDCCH, b"\x01\x02")])[8:])
    assert tti == 42 and pdus == [(vnf.PDSCH, b"hello"),
                                  (vnf.PDCCH, b"\x01\x02")]
    sfn, slot, pdus = vnf.unpack_rx_data_ind(
        vnf.pack_rx_data_ind(7, 12, 3, [(vnf.PUSCH, b"ul")])[8:])
    assert (sfn, slot) == (12, 3) and pdus == [(vnf.PUSCH, b"ul")]
    t, pdus = vnf.unpack_dl_ind(vnf.pack_dl_ind(1, 9, [(vnf.PDSCH, b"dl")])[8:])
    assert t == 9 and pdus == [(vnf.PDSCH, b"dl")]


def test_vnf_pnf_split_delivers_tb():
    """A MAC TB queued at the gNB VNF crosses the UDP split, is encoded by
    the PNF's device workers, decoded by the UE PNF, and arrives at the UE
    VNF as a DL_IND PDU."""
    car = NrCarrier(n_prb=52, n_id=33)
    cs = Coreset.full(48, duration=1, id=1)
    common = NrWorkerCommon(carrier=car, coreset=cs, mcs=20)

    # ephemeral loopback ports: bind to 0 then cross-wire
    gnb_pnf_link = vnf._Udp(0, 0)
    gnb_vnf_link = vnf._Udp(0, gnb_pnf_link.port)
    gnb_pnf_link.peer = ("127.0.0.1", gnb_vnf_link.port)
    ue_pnf_link = vnf._Udp(0, 0)
    ue_vnf_link = vnf._Udp(0, ue_pnf_link.port)
    ue_pnf_link.peer = ("127.0.0.1", ue_vnf_link.port)

    gnb_pnf = vnf.GnbPnf(GnbNrWorker(common), gnb_pnf_link)
    gnb_vnf = vnf.GnbVnf(gnb_vnf_link)
    ue_pnf = vnf.UePnf(UeNrWorker(common), ue_pnf_link)
    ue_vnf = vnf.UeVnf(ue_vnf_link)

    tbs = common.phy_grant(0).tbs
    rng = np.random.default_rng(4)
    tb = rng.integers(0, 256, tbs // 8, dtype=np.uint8).tobytes()
    gnb_vnf.tx_queue.append(tb)

    import threading

    # the VNF answers the PNF's SF_IND from a helper thread (the reference
    # runs them as separate processes; same socket semantics)
    th = threading.Thread(target=gnb_vnf.handle_one)
    th.start()
    grid = gnb_pnf.run_slot(0)
    th.join()
    assert grid is not None  # the queued TB was scheduled this slot

    ul = ue_pnf.run_slot(grid, 0)  # noiseless: decodes, emits DL_IND + ACK
    assert ul is not None
    ue_vnf.handle_one()
    gnb_pnf.worker.rx_ul_slot(ul, 0)
    assert not gnb_pnf.worker._awaiting  # ACK cleared the HARQ process
    assert ue_vnf.rx_tbs and ue_vnf.rx_tbs[0] == tb
    for l in (gnb_pnf_link, gnb_vnf_link, ue_pnf_link, ue_vnf_link):
        l.close()

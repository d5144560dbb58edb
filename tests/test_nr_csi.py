"""NR CSI reporting (csi.c analog): quantization, triggers, UCI packing,
and the measure -> quantify -> PUCCH-2 -> unpack flow."""

import jax.numpy as jnp
import numpy as np
import pytest

from srslte_tpu.phy.nr.csi import (CqiTable, CsiMeasurements, CsiPeriodic,
                                   CsiReport, CsiReportCfg, nof_bits, pack,
                                   quantify, report_trigger, snri_db_to_cqi,
                                   unpack)
from srslte_tpu.phy.nr.csi_rs import NzpCsiRs, csi_rs_measure, csi_rs_put
from srslte_tpu.phy.nr.params import NSYMB_SLOT, NrCarrier
from srslte_tpu.phy.nr.pucch_nr import NrPucch, NrPucchResource


def test_snri_to_cqi_monotone_and_bounded():
    prev = 0
    for snr in range(-10, 40, 2):
        cqi = snri_db_to_cqi(CqiTable.TABLE_1, snr)
        assert 0 <= cqi <= 15
        assert cqi >= prev
        prev = cqi
    assert snri_db_to_cqi(CqiTable.TABLE_1, -10.0) == 0
    assert snri_db_to_cqi(CqiTable.TABLE_1, 30.0) == 15
    # 256QAM table needs more SNR for the same index
    assert (snri_db_to_cqi(CqiTable.TABLE_2, 10.0)
            <= snri_db_to_cqi(CqiTable.TABLE_1, 10.0))
    # low-SE table reaches indices earlier
    assert (snri_db_to_cqi(CqiTable.TABLE_3, 0.0)
            >= snri_db_to_cqi(CqiTable.TABLE_1, 0.0))


def test_periodic_trigger():
    cfg = CsiReportCfg(periodic=CsiPeriodic(period=20, offset=3))
    hits = [s for s in range(100) if report_trigger(cfg, s)]
    assert hits == [3, 23, 43, 63, 83]
    assert not report_trigger(CsiReportCfg(), 3)  # aperiodic: no self-trigger


def test_quantify_sinr_paths():
    cfg = CsiReportCfg()
    ch = CsiMeasurements(wideband_snr_db=20.0, wideband_rsrp_dbm=-80.0)
    # SNR path
    r = quantify(cfg, ch)
    assert r.cqi == snri_db_to_cqi(CqiTable.TABLE_1, 20.0)
    # interference path: SINR = RSRP - interference EPRE
    interf = CsiMeasurements(wideband_snr_db=0.0, wideband_epre_dbm=-90.0)
    r2 = quantify(cfg, ch, interf)
    assert r2.cqi == snri_db_to_cqi(CqiTable.TABLE_1, 10.0)


@pytest.mark.parametrize("k,expected", [(1, 4), (2, 5), (4, 6)])
def test_nof_bits_and_pack_roundtrip(k, expected):
    cfg = CsiReportCfg(K_csi_rs=k)
    assert nof_bits(cfg) == expected
    rep = CsiReport(cqi=11, cri=k - 1)
    bits = pack(cfg, rep)
    assert len(bits) == expected
    got = unpack(cfg, bits)
    assert got.cqi == 11 and got.cri == k - 1
    assert nof_bits(CsiReportCfg(quantity="none", K_csi_rs=3)) == 3


def test_csi_rs_to_pucch_report_flow():
    """Measure NZP CSI-RS -> quantify CQI -> PUCCH format 2 -> unpack."""
    rng = np.random.default_rng(0)
    car = NrCarrier(n_prb=52, n_id=77)
    res = NzpCsiRs(row=1, nof_rb=52)
    slot = 4
    g = csi_rs_put(res, car, slot, jnp.zeros((NSYMB_SLOT, car.nof_re),
                                             np.complex64))
    h0 = 0.9 * np.exp(0.4j)
    sigma = 0.05
    rx = np.asarray(g) * h0
    rx += sigma * (rng.standard_normal(rx.shape)
                   + 1j * rng.standard_normal(rx.shape))
    meas = csi_rs_measure(res, car, slot, jnp.asarray(rx.astype(np.complex64)))
    snr_db = float(np.asarray(meas["snr_db"]))
    assert abs(snr_db - 10 * np.log10(abs(h0) ** 2 / (2 * sigma**2))) < 2.0

    cfg = CsiReportCfg(periodic=CsiPeriodic(period=10, offset=4))
    assert report_trigger(cfg, slot)
    report = quantify(cfg, CsiMeasurements(wideband_snr_db=snr_db))
    assert report.cqi >= 8  # ~22 dB SNR: high CQI

    # carry o_csi1 over PUCCH format 2
    pu = NrPucch(car, slot)
    pres = NrPucchResource(format=2, starting_prb=10, start_symbol=13,
                           nof_symbols=1, nof_prb=1)
    uci = pack(cfg, report)
    g2 = pu.format2_encode(jnp.zeros((NSYMB_SLOT, car.nof_re), np.complex64),
                           pres, uci, rnti=0x4601)
    rx2 = np.asarray(g2) * h0 + 0.02 * (
        rng.standard_normal(g2.shape) + 1j * rng.standard_normal(g2.shape))
    got, ok = pu.format2_decode(jnp.asarray(rx2.astype(np.complex64)), pres,
                                nof_bits(cfg), rnti=0x4601)
    assert ok
    assert unpack(cfg, got) == report

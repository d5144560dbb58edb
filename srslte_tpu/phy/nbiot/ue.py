"""NB-IoT high-level UE objects: sync, cell search, MIB, DL receive chain.

Reference behavior: lib/src/phy/ue/{ue_sync_nbiot.c, ue_cell_search_nbiot.c,
ue_mib_nbiot.c, ue_dl_nbiot.c} and lib/src/phy/sync/sync_nbiot.c — the
FIND->TRACK sample alignment at 1.92 Msps, NPSS-based timing + CFO, NSSS
cell-id/frame-position detection, the NPBCH decode loop over the 64-frame
period, and the per-subframe NRS chest + NPDCCH/NPDSCH decode front end
(plus the eNB-side composition mirroring lib/examples/npdsch_enodeb.c).

TPU-first: the standalone NB-IoT carrier rides the 6-PRB/128-FFT OFDM
bucket (1.92 Msps).  The NB-IoT PRB occupies REs 36..47 of the 72-RE host
grid — FFT bins 1..12, the same convention as the NPSS replica in
sync.py:46 (subcarrier k -> bin k+1).  NPSS search is one batched FFT
correlation, NSSS one [2016, 132] matmul, NPBCH one blind 16-hypothesis
Viterbi dispatch, and chest is a closed-form LS over the 8 NRS pilots
(flat 180-kHz channel).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..common.params import OfdmParams
from ..ofdm import Ofdm
from .npbch import MibNb, Npbch
from .npdcch import Npdcch
from .npdsch import NbDlGrant, Npdsch
from .nrs import NRS_SYMBOLS, nrs_subcarriers, nrs_values
from .sync import npss_find, npss_sequence, npss_time, nsss_find, nsss_sequence

HOST_PRB = 6  # host numerology bucket: 1.92 Msps, FFT 128
NB_RE0 = 36  # first RE of the NB-IoT PRB inside the 72-RE host grid
SYNC_SYMBOLS = tuple(range(3, 14))  # NPSS/NSSS symbols within the subframe


@functools.lru_cache(maxsize=1)
def nsss_re_order() -> np.ndarray:
    """Flat [132] grid indices of NSSS d(0..131): subcarrier-first over
    symbols 3..13 (36.211 section 10.2.7.2.2)."""
    return np.concatenate(
        [l * 12 + np.arange(12) for l in SYNC_SYMBOLS]).astype(np.int32)


@dataclass(frozen=True)
class NbOfdm:
    """Standalone NB-IoT carrier modem over the 6-PRB host bucket."""

    @functools.cached_property
    def host(self) -> Ofdm:
        return Ofdm(OfdmParams(HOST_PRB))

    @property
    def params(self) -> OfdmParams:
        return self.host.params

    @property
    def sf_len(self) -> int:
        return self.params.sf_len  # 1920 samples per subframe

    def tx_sf(self, nb_grid):
        """NB grid [..., 14, 12] -> samples [..., 1920]."""
        import jax.numpy as jnp

        shape = nb_grid.shape[:-1] + (self.params.nof_re,)
        g = jnp.zeros(shape, jnp.complex64)
        g = g.at[..., NB_RE0 : NB_RE0 + 12].set(nb_grid)
        return self.host.tx_sf(g)

    def rx_sf(self, samples):
        """Samples [..., 1920] -> NB grid [..., 14, 12]."""
        return self.host.rx_sf(samples)[..., NB_RE0 : NB_RE0 + 12]

    @functools.cached_property
    def npss_offset(self) -> int:
        """Sample offset of NPSS (symbol 3) within its subframe."""
        cps = self.params.cp_lens_slot()
        return sum(cps[i] + self.params.symbol_sz for i in range(3))


# ---------------------------------------------------------------------------
# channel estimation (NRS LS, flat narrowband model)
# ---------------------------------------------------------------------------

def nb_chest(grid, n_id: int, sf_idx: int):
    """NRS LS estimate -> (ce [2, 14, 12], noise_var scalar).

    grid [..., 14, 12].  The 180-kHz carrier is frequency-flat within any
    3GPP delay spread, so the estimate is the pilot mean per port
    (chest_dl_nbiot's averaging limit); noise is the pilot residual
    variance on port 0.  An absent port 1 yields ce[1] ~ 0, which the
    NPBCH port hypothesis test rejects naturally.
    """
    import jax.numpy as jnp

    ce_ports = []
    resid = None
    vals = nrs_values(n_id, sf_idx)  # [4, 2] unit-modulus
    for p in range(2):
        scs = nrs_subcarriers(n_id, p)  # [4, 2]
        sym = np.repeat(np.asarray(NRS_SYMBOLS), 2)
        sc = scs.reshape(-1)
        y = grid[..., jnp.asarray(sym), jnp.asarray(sc)]  # [..., 8]
        ls = y * jnp.conj(jnp.asarray(vals.reshape(-1)))
        h = jnp.mean(ls, axis=-1)
        if p == 0:
            resid = jnp.mean(jnp.abs(ls - h[..., None]) ** 2, axis=-1)
        ce_ports.append(jnp.broadcast_to(h[..., None, None],
                                         h.shape + (14, 12)))
    return jnp.stack(ce_ports, axis=-3), resid


# ---------------------------------------------------------------------------
# eNB-side frame composition (npdsch_enodeb.c analog)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class NbEnbDl:
    """Standalone NB-IoT downlink frame composer (1 or 2 NRS ports)."""

    n_id: int
    nof_ports: int = 1

    @functools.cached_property
    def ofdm(self) -> NbOfdm:
        return NbOfdm()

    @functools.cached_property
    def npbch(self) -> Npbch:
        return Npbch(self.n_id, self.nof_ports)

    def _put_nrs(self, grid, sf_idx: int):
        import jax.numpy as jnp

        vals = nrs_values(self.n_id, sf_idx)
        for p in range(self.nof_ports):
            scs = nrs_subcarriers(self.n_id, p)
            sym = np.repeat(np.asarray(NRS_SYMBOLS), 2)
            sc = scs.reshape(-1)
            grid = grid.at[..., p, jnp.asarray(sym), jnp.asarray(sc)].set(
                jnp.asarray(vals.reshape(-1)))
        return grid

    def frame_grids(self, mib: MibNb, nf: int, data: dict | None = None):
        """One radio frame -> grids [10, 2, 14, 12].

        data: optional {sf_idx: encoder} where encoder(grids[sf]) writes a
        pre-encoded NPDCCH/NPDSCH subframe (sf_idx not in {0, 5, 9}).
        """
        import jax.numpy as jnp

        sfs = []
        for sf_idx in range(10):
            g = jnp.zeros((2, 14, 12), jnp.complex64)
            if sf_idx == 5:
                seq = jnp.asarray(npss_sequence())  # [11, 11]
                for i, l in enumerate(SYNC_SYMBOLS):
                    g = g.at[0, l, 0:11].set(seq[i])
            elif sf_idx == 9 and nf % 2 == 0:
                d = jnp.asarray(nsss_sequence(self.n_id, (nf // 2) % 4))
                flat = g.reshape(2, -1)
                flat = flat.at[0, jnp.asarray(nsss_re_order())].set(d)
                g = flat.reshape(2, 14, 12)
            else:
                g = self._put_nrs(g, sf_idx)
                if sf_idx == 0:
                    g = self.npbch.encode_frame(mib, nf, g)
                elif data and sf_idx in data:
                    g = data[sf_idx](g)
            sfs.append(g)
        return jnp.stack(sfs)

    def frame_signal(self, mib: MibNb, nf: int, data: dict | None = None):
        """One radio frame -> port-0 time samples [19200]."""
        grids = self.frame_grids(mib, nf, data)
        s = self.ofdm.tx_sf(grids)  # [10, 2, 1920]
        return s[:, : self.nof_ports].sum(axis=1).reshape(-1)


# ---------------------------------------------------------------------------
# UE-side objects
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class UeSyncNbiot:
    """NPSS-based sample alignment: FIND over a capture, TRACK per frame."""

    @functools.cached_property
    def ofdm(self) -> NbOfdm:
        return NbOfdm()

    def find(self, samples):
        """samples [n] -> (sf0_offset, cfo_hz, metric).

        Locates the strongest NPSS (subframe 5, symbols 3..13) and derives
        the offset of the *next* subframe-0 boundary at or after 0.
        """
        import jax.numpy as jnp

        off, metric = npss_find(samples)
        off = int(np.asarray(off))
        cfo = self.cfo_from_npss(samples, off)
        sf_len = self.ofdm.sf_len
        # earliest equivalent frame boundary (the detected peak may be any
        # of the capture's NPSS repetitions)
        sf0 = (off - self.ofdm.npss_offset - 5 * sf_len) % (10 * sf_len)
        return sf0, float(np.asarray(cfo)), float(np.asarray(metric))

    def cfo_from_npss(self, samples, off: int):
        """CFO (Hz) from per-symbol NPSS correlation phase increments."""
        import jax.numpy as jnp

        p = self.ofdm.params
        rep = npss_time(p.symbol_sz)
        r = samples[off : off + len(rep)]
        cps = (p.cp_lens_slot() * 2)[3:14]
        prods = []
        pos = 0
        for cp in cps:
            n = cp + p.symbol_sz
            prods.append(jnp.vdot(rep[pos : pos + n], r[pos : pos + n]))
            pos += n
        prods = jnp.stack(prods)
        rot = jnp.sum(prods[1:] * jnp.conj(prods[:-1]))
        d = len(rep) / (len(cps) - 1)  # mean symbol spacing in samples
        return jnp.angle(rot) * p.srate / (2 * np.pi * d)

    def track(self, samples, expected_npss: int, window: int = 8):
        """Re-correlate around the expected NPSS position -> offset delta."""
        import jax.numpy as jnp

        rep = npss_time(self.ofdm.params.symbol_sz)
        lo = max(expected_npss - window, 0)
        seg = samples[lo : expected_npss + window + len(rep)]
        off, metric = npss_find(seg)
        return int(np.asarray(off)) + lo - expected_npss, float(np.asarray(metric))


def cfo_correct(samples, cfo_hz: float, srate: int = 1920000):
    import jax.numpy as jnp

    n = jnp.arange(samples.shape[-1], dtype=jnp.float32)
    ph = -2.0 * np.pi * cfo_hz / srate * n
    return samples * jnp.exp(1j * ph.astype(jnp.float32))


@dataclass(frozen=True)
class UeCellSearchNbiot:
    """NPSS timing + NSSS identity scan (ue_cell_search_nbiot.c analog)."""

    @functools.cached_property
    def ofdm(self) -> NbOfdm:
        return NbOfdm()

    def search(self, samples):
        """samples [>= 40 ms] -> dict(n_id, frame_pos, sf0_offset, cfo_hz).

        NPSS fixes 10-ms timing; the two 10-ms NSSS hypotheses (subframe 9
        of even frames) are both correlated and the stronger wins, yielding
        n_id and nf/2 mod 4.  sf0_offset points at an even frame boundary.
        """
        import jax.numpy as jnp

        sync = UeSyncNbiot()
        sf0, cfo, metric = sync.find(samples)
        x = cfo_correct(samples, cfo)
        sf_len = self.ofdm.sf_len
        order = jnp.asarray(nsss_re_order())
        best = None
        for hyp in range(2):
            start = sf0 + hyp * 10 * sf_len + 9 * sf_len
            if start + sf_len > x.shape[-1]:
                continue
            grid = self.ofdm.rx_sf(x[start : start + sf_len])
            d = grid.reshape(-1)[order]
            nid, fpos, m = nsss_find(d)
            m = float(np.asarray(m))
            if best is None or m > best[2]:
                best = (int(np.asarray(nid)), int(np.asarray(fpos)), m, hyp)
        if best is None:
            return None
        nid, fpos, m, hyp = best
        even_sf0 = sf0 + hyp * 10 * sf_len
        return {"n_id": nid, "frame_pos": fpos, "sf0_offset": even_sf0,
                "cfo_hz": cfo, "nsss_metric": m, "npss_metric": metric}


@dataclass(frozen=True)
class UeMibNbiot:
    """NPBCH decode loop over per-frame subframe-0 captures."""

    n_id: int

    @functools.cached_property
    def ofdm(self) -> NbOfdm:
        return NbOfdm()

    def decode(self, sf0_samples):
        """sf0_samples [nframes, 1920] -> (ok, MibNb, block_phase, frame).

        Tries each frame until one NPBCH repetition block decodes; the
        blind (block x port) hypothesis set resolves nf mod 64 // 8.
        """
        npbch = Npbch(self.n_id, nof_ports=2)
        for i in range(sf0_samples.shape[0]):
            grid = self.ofdm.rx_sf(sf0_samples[i])
            ce, _ = nb_chest(grid, self.n_id, sf_idx=0)
            ok, mib, block = npbch.decode(grid, ce)
            if ok:
                return True, mib, block, i
        return False, None, None, None


@dataclass(frozen=True)
class UeDlNbiot:
    """Per-subframe NB-IoT DL front end (ue_dl_nbiot.c analog)."""

    n_id: int

    @functools.cached_property
    def ofdm(self) -> NbOfdm:
        return NbOfdm()

    def fft_estimate(self, samples, sf_idx: int):
        """samples [..., 1920] -> (grid [..., 14, 12], ce, noise)."""
        grid = self.ofdm.rx_sf(samples)
        ce, noise = nb_chest(grid, self.n_id, sf_idx)
        return grid, ce, noise

    def search_npdcch(self, grid, ce, rnti: int, sf_idx: int):
        """Blind NPDCCH search -> ((ncce, fmt), DciN0/N1) or None."""
        return Npdcch(self.n_id, sf_idx).search(grid, ce, rnti)

    def decode_npdsch(self, grids, ces, sf_nf: tuple, grant: NbDlGrant,
                      rnti: int):
        """Multi-subframe NPDSCH decode -> (bits, crc_ok)."""
        return Npdsch(self.n_id, grant, rnti).decode(grids, ces, sf_nf)

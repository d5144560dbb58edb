"""Downlink channel estimation from CRS (chest_dl.c equivalent).

Reference behavior: lib/src/phy/ch_estimation/chest_dl.c — LS estimates at
pilot REs (rx * conj(ref)), optional time-averaging across the subframe's CRS
symbols (average_pilots, chest_dl.c:558), linear interpolation in frequency
with edge extrapolation (:438), linear interpolation/extrapolation in time,
noise estimated from the pilot residual (:325).

TPU-first: the pilot extraction is a static gather, interpolation is a
precomputed sparse weight matrix per (cell, port) bucket applied as one
matmul [..., n_pilots] @ [n_pilots, nof_re] (MXU), and everything vectorizes
over leading batch dims (subframes, carriers, rx antennas).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..common.params import Cell
from . import refsignal_dl as rs


def _interp_matrix(pos: np.ndarray, n: int) -> np.ndarray:
    """Linear interpolation/extrapolation weights: [len(pos), n] float32.

    Value at x in [0, n) from samples at positions pos (sorted, >=2 entries).
    Matches srsran_interp_linear_offset semantics (linear between pilots,
    linear extrapolation at both edges).
    """
    pos = np.asarray(pos, np.float64)
    w = np.zeros((len(pos), n), np.float32)
    x = np.arange(n, dtype=np.float64)
    seg = np.clip(np.searchsorted(pos, x, side="right") - 1, 0, len(pos) - 2)
    x0, x1 = pos[seg], pos[seg + 1]
    t = (x - x0) / (x1 - x0)
    w[seg, np.arange(n)] = (1 - t).astype(np.float32)
    w[seg + 1, np.arange(n)] += t.astype(np.float32)
    return w


def _wiener_matrix(pilot_k: np.ndarray, n: int, tau_max: float,
                   snr_lin: float, out_k: np.ndarray | None = None) -> np.ndarray:
    """MMSE (Wiener) frequency filter [P, n] for a uniform PDP of length
    tau_max (fraction of the symbol; CP-length is the natural choice).

    R(dk) = E[h(k) h*(k+dk)] for a uniform power-delay profile on
    [0, tau_max*N] samples: sinc envelope with a linear phase — the same
    model wiener_dl.c tabulates.  W = R_dp (R_pp + I/snr)^-1.

    pilot_k/out_k must be FFT-BIN coordinates (continuous spacing); the
    caller accounts for the skipped DC bin in the RE grid.
    """
    # uniform PDP on [a, b] with margins: robust to taps slightly outside
    # the CP and to timing-offset bias (wiener_dl.c centers similarly)
    a, b = -0.25 * tau_max, 1.25 * tau_max

    def corr(dk):
        x = np.pi * dk * (b - a)
        s = np.where(np.abs(x) < 1e-9, 1.0, np.sin(x) / np.where(x == 0, 1, x))
        return s * np.exp(-1j * np.pi * dk * (a + b))

    kp = pilot_k.astype(np.float64)
    ka = (np.arange(n, dtype=np.float64) if out_k is None
          else np.asarray(out_k, np.float64))
    r_pp = corr(kp[:, None] - kp[None, :])
    r_dp = corr(ka[:, None] - kp[None, :])
    w = r_dp @ np.linalg.inv(r_pp + np.eye(len(kp)) / snr_lin)
    return w.T.astype(np.complex64)  # [P, n] for pil @ W


@dataclass(frozen=True)
class ChestDL:
    """Channel estimator for one cell bucket.

    algorithm: "average" (time-average CRS symbols then one freq interp — the
    reference's SRSRAN_ESTIMATOR_ALG_AVERAGE), "interpolate" (per-CRS-symbol
    freq interp + linear time interp), or "wiener" (MMSE frequency filter
    assuming a CP-length uniform PDP at wiener_snr_db — wiener_dl.c analog).
    """

    cell: Cell
    algorithm: str = "average"
    wiener_snr_db: float = 20.0

    @functools.cached_property
    def _tables(self):
        """Per-port static tables."""
        o = self.cell.ofdm
        tabs = []
        for port in range(self.cell.nof_ports):
            syms, ks = rs.crs_re_indices(self.cell, port)
            if self.algorithm in ("average", "wiener"):
                # merge all CRS symbols: pilot freq positions = union of shifts
                allk = np.unique(ks.reshape(-1))
                if self.algorithm == "wiener":
                    cp = o.cp_lens_slot()[1]
                    # RE-grid index -> continuous bin coordinate (the grid
                    # skips the DC bin between halves)
                    half = o.nof_re // 2
                    pk = allk + (allk >= half)
                    ok_ = np.arange(o.nof_re) + (np.arange(o.nof_re) >= half)
                    w = _wiener_matrix(pk, o.nof_re, cp / o.symbol_sz,
                                       10 ** (self.wiener_snr_db / 10), ok_)
                else:
                    w = _interp_matrix(allk, o.nof_re)  # [P, nof_re]
                tabs.append((syms, ks, allk, w, None))
            else:
                w = np.stack([_interp_matrix(k, o.nof_re) for k in ks])
                tw = _interp_matrix(syms.astype(np.float64), o.nsymb_sf)  # [S, nsym]
                tabs.append((syms, ks, None, w, tw))
        return tabs

    def pilots(self, sf_idx: int, port: int) -> np.ndarray:
        return rs.crs_pilots(self.cell, sf_idx, port)

    def estimate(self, grid, sf_idx: int):
        """grid [..., nsym_sf, nof_re] -> (ce [..., nports, nsym_sf, nof_re],
        info dict with noise/rsrp/snr per batch element).

        Single-rx-antenna semantics; vmap/batch for multiple rx antennas.
        """
        import jax.numpy as jnp

        o = self.cell.ofdm
        ces, noises, rsrps = [], [], []
        for port in range(self.cell.nof_ports):
            syms, ks, allk, w, tw = self._tables[port]
            refs = jnp.asarray(self.pilots(sf_idx, port))  # [S, 2nprb]
            rx = grid[..., jnp.asarray(syms)[:, None], jnp.asarray(ks)]
            ls = rx * jnp.conj(refs)  # LS estimates [., S, 2nprb]

            rsrp = jnp.abs(jnp.mean(ls, axis=(-1, -2))) ** 2  # per batch element
            if self.algorithm in ("average", "wiener"):
                # average the S shifted pilot combs onto the union grid allk
                slot = np.searchsorted(allk, ks)  # [S, 2nprb] -> union position
                acc = jnp.zeros(ls.shape[:-2] + (len(allk),), ls.dtype)
                cnt = np.zeros(len(allk), np.float32)
                for s in range(ls.shape[-2]):
                    acc = acc.at[..., slot[s]].add(ls[..., s, :])
                    np.add.at(cnt, slot[s], 1.0)
                pil = acc / jnp.asarray(cnt)
                ce_f = jnp.matmul(pil, jnp.asarray(w))  # [., nof_re]
                ce = jnp.broadcast_to(ce_f[..., None, :],
                                      ce_f.shape[:-1] + (o.nsymb_sf, o.nof_re))
                # noise from the pilot residual; averaging cnt pilots leaves
                # sigma^2*(1-1/cnt), so rescale (exact for uniform cnt)
                sm = pil[..., jnp.asarray(slot)]  # [., S, 2nprb]
                c = float(cnt.mean())
                scale = c / (c - 1.0) if c > 1.0 else 0.0
                noise = jnp.mean(jnp.abs(ls - sm) ** 2, axis=(-1, -2)) * scale
            else:
                ce_sym = jnp.einsum("...sp,spk->...sk", ls, jnp.asarray(w))
                ce = jnp.einsum("...sk,sn->...nk", ce_sym, jnp.asarray(tw))
                mid = jnp.mean(ls, axis=-2, keepdims=True)
                noise = jnp.mean(jnp.abs(ls - mid) ** 2, axis=(-1, -2))
            ces.append(ce)
            noises.append(noise)
            rsrps.append(rsrp)
        ce = jnp.stack(ces, axis=-3)  # [..., nports, nsym, nre]
        noise = jnp.mean(jnp.stack(noises, axis=-1), axis=-1)
        rsrp = jnp.mean(jnp.stack(rsrps, axis=-1), axis=-1)
        snr = rsrp / jnp.maximum(noise, 1e-12)
        return ce, {"noise": noise, "rsrp": rsrp, "snr": snr}

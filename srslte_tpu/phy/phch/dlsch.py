"""DL-SCH transport channel coding (36.212 §5.3.2, sch.c equivalent).

Reference behavior: lib/src/phy/phch/sch.c (srsran_dlsch_encode / decode_tb:
TB CRC24A -> segmentation (+CRC24B per CB) -> per-CB turbo + rate matching ->
concatenation; decode reverses with soft combining and CRC gates).

TPU-first: every stage is static-shape per (tbs, G, Qm) bucket.  Code blocks
of equal (K, E, F) are decoded as one batch through the scan-based max-log-MAP
decoder; CRCs are GF(2) matmuls (fec.crc.crc_ok_device).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..fec import crc as crcmod
from ..fec import turbo
from ..fec.cbsegm import CbSegm, cbsegm
from ..fec.tdec import turbo_decode


@dataclass(frozen=True)
class CbGroup:
    """A run of code blocks sharing static shapes."""

    first_r: int  # index of first CB in TB order
    count: int
    K: int
    E: int
    F: int  # filler bits (only ever non-zero for the group containing CB 0)
    data_bits: int  # payload bits carried per CB (K - F - cb_crc)


@dataclass(frozen=True)
class DlschConfig:
    """Static shapes for one transport block bucket."""

    tbs: int
    G: int  # total coded bits available (n_re * Qm * n_layers)
    Qm: int
    n_layers: int = 1
    rv: int = 0

    @functools.cached_property
    def seg(self) -> CbSegm:
        return cbsegm(self.tbs)

    @functools.cached_property
    def groups(self) -> tuple[CbGroup, ...]:
        seg = self.seg
        c = seg.C
        cb_crc = 24 if c > 1 else 0
        # 36.212 §5.1.4.1.2 bit selection: E per CB
        gp = self.G // (self.n_layers * self.Qm)
        gamma = gp % c
        e_lo = self.n_layers * self.Qm * (gp // c)
        e_hi = self.n_layers * self.Qm * (-(-gp // c))
        ks = [seg.K2] * seg.C2 + [seg.K1] * seg.C1  # K- blocks first (36.212)
        es = [e_lo if r <= c - gamma - 1 else e_hi for r in range(c)]
        fs = [seg.F if r == 0 else 0 for r in range(c)]
        groups: list[CbGroup] = []
        r = 0
        while r < c:
            r2 = r
            while r2 + 1 < c and (ks[r2 + 1], es[r2 + 1], fs[r2 + 1]) == (ks[r], es[r], fs[r]):
                r2 += 1
            groups.append(CbGroup(first_r=r, count=r2 - r + 1, K=ks[r], E=es[r], F=fs[r],
                                  data_bits=ks[r] - fs[r] - cb_crc))
            r = r2 + 1
        assert sum(g.count * g.data_bits for g in groups) == self.tbs + 24
        return tuple(groups)


def dlsch_encode(bits, cfg: DlschConfig):
    """bits [..., tbs] {0,1} -> coded bits [..., G] uint8 (jittable)."""
    import jax.numpy as jnp

    seg = cfg.seg
    # TB CRC24A
    poly, order = crcmod.LTE_CRC24A
    ga = jnp.asarray(crcmod.crc_matrix(cfg.tbs, poly, order), jnp.int8)
    tb_crc = (jnp.matmul(bits.astype(jnp.int8), ga, preferred_element_type=jnp.int32) & 1)
    b = jnp.concatenate([bits.astype(jnp.int32), tb_crc], axis=-1)

    out = []
    pos = 0
    for g in cfg.groups:
        for i in range(g.count):
            chunk = b[..., pos : pos + g.data_bits]
            pos += g.data_bits
            cb = chunk
            if g.F:
                cb = jnp.concatenate(
                    [jnp.zeros(chunk.shape[:-1] + (g.F,), jnp.int32), chunk], axis=-1)
            if seg.C > 1:
                pb, po = crcmod.LTE_CRC24B
                gb = jnp.asarray(crcmod.crc_matrix(g.K - 24, pb, po), jnp.int8)
                cbc = (jnp.matmul(cb.astype(jnp.int8), gb, preferred_element_type=jnp.int32) & 1)
                cb = jnp.concatenate([cb, cbc], axis=-1)
            d = turbo.turbo_encode(cb, g.K)
            out.append(turbo.rm_tx(d, g.K, e=g.E, rv=cfg.rv, f=g.F))
    return jnp.concatenate(out, axis=-1).astype(jnp.uint8)


def dlsch_decode(llr, cfg: DlschConfig, n_iter: int = 5, early: int = 1,
                 compact_frac: int = 8):
    """llr [..., G] (positive ⇒ bit 1) -> (bits [..., tbs] uint8, crc_ok [...]).

    Early termination, TPU style: the reference's turbo decoder stops
    iterating per CB when the CRC passes (effectively 1-2 iterations at
    operating SNR, max 8 — ue_phy_interfaces.h pdsch_max_its).  Data-
    dependent per-CB exit doesn't fit static shapes, so:

      phase 1: decode ALL code blocks at `early` iterations; CB-level CRC.
      phase 2: gather the failing CBs into a dense batch of static capacity
        ceil(N/compact_frac), decode those at the full n_iter, scatter the
        results back.  Only when the failure count exceeds the capacity
        (wrong operating point) does a lax.cond re-decode the whole batch.

    On a clean channel this costs `early` iterations; at an operating point
    with a few percent early-phase failures it costs early + n_iter/compact_
    frac instead of early + n_iter.
    """
    import jax
    import jax.numpy as jnp

    if not (early and early < n_iter):
        return _dlsch_decode_fixed(llr, cfg, n_iter)

    seg = cfg.seg
    batch = llr.shape[:-1]
    parts, ok_parts = [], []
    pos = 0
    for g in cfg.groups:
        block = llr[..., pos : pos + g.count * g.E]
        pos += g.count * g.E
        e = block.reshape(batch + (g.count, g.E))
        w = turbo.rm_rx(e, g.K, rv=cfg.rv, f=g.F)
        flat = w.reshape((-1, w.shape[-1]))  # [Ng, 3(K+4)]
        ng = int(np.prod(batch)) * g.count
        hard1, _ = turbo_decode(flat, g.K, n_iter=early)

        if seg.C > 1:
            pb, po = crcmod.LTE_CRC24B
            ok1 = crcmod.crc_ok_device(hard1, pb, po)  # [Ng]
        else:
            pa, oa = crcmod.LTE_CRC24A
            ok1 = crcmod.crc_ok_device(hard1[..., g.F :], pa, oa)

        cap = max(1, -(-ng // compact_frac))
        order = jnp.argsort(ok1.astype(jnp.int32), stable=True)  # fails first
        idx = order[:cap]
        nfail = jnp.sum(jnp.logical_not(ok1))

        def retry_compact(flat=flat, hard1=hard1, ok1=ok1, idx=idx, g=g):
            hard2, _ = turbo_decode(flat[idx], g.K, n_iter=n_iter)
            keep = ok1[idx][:, None]  # already-good rows keep phase-1 bits
            return hard1.at[idx].set(jnp.where(keep, hard1[idx], hard2))

        def retry_full(flat=flat, g=g):
            return turbo_decode(flat, g.K, n_iter=n_iter)[0]

        hard = jax.lax.cond(
            nfail == 0, lambda: hard1,
            lambda: jax.lax.cond(nfail <= cap, retry_compact, retry_full))
        hard = hard.reshape(batch + (g.count, g.K))
        if seg.C > 1:
            pb, po = crcmod.LTE_CRC24B
            ok_parts.append(crcmod.crc_ok_device(hard, pb, po))
            payload = hard[..., g.F : g.K - 24]
        else:
            payload = hard[..., g.F :]
        parts.append(payload.reshape(batch + (g.count * g.data_bits,)))

    b = jnp.concatenate(parts, axis=-1)  # [..., tbs+24]
    pa, oa = crcmod.LTE_CRC24A
    tb_ok = crcmod.crc_ok_device(b, pa, oa)
    if ok_parts:
        cb_ok = jnp.all(jnp.concatenate(ok_parts, axis=-1), axis=-1)
        tb_ok = jnp.logical_and(tb_ok, cb_ok)
    return b[..., : cfg.tbs].astype(jnp.uint8), tb_ok


def _dlsch_decode_fixed(llr, cfg: DlschConfig, n_iter: int):
    """Fixed-iteration decode of the whole batch."""
    import jax.numpy as jnp

    seg = cfg.seg
    batch = llr.shape[:-1]
    parts, ok_parts = [], []
    pos = 0
    for g in cfg.groups:
        block = llr[..., pos : pos + g.count * g.E]
        pos += g.count * g.E
        e = block.reshape(batch + (g.count, g.E))
        w = turbo.rm_rx(e, g.K, rv=cfg.rv, f=g.F)
        flat = w.reshape((-1, w.shape[-1]))
        hard, _ = turbo_decode(flat, g.K, n_iter=n_iter)
        hard = hard.reshape(batch + (g.count, g.K))
        if seg.C > 1:
            pb, po = crcmod.LTE_CRC24B
            ok = crcmod.crc_ok_device(hard, pb, po)  # [..., count]
            ok_parts.append(ok)
            payload = hard[..., g.F : g.K - 24]
        else:
            payload = hard[..., g.F :]
        parts.append(payload.reshape(batch + (g.count * g.data_bits,)))
    b = jnp.concatenate(parts, axis=-1)  # [..., tbs+24]
    pa, oa = crcmod.LTE_CRC24A
    tb_ok = crcmod.crc_ok_device(b, pa, oa)
    if ok_parts:
        cb_ok = jnp.all(jnp.concatenate(ok_parts, axis=-1), axis=-1)
        tb_ok = jnp.logical_and(tb_ok, cb_ok)
    return b[..., : cfg.tbs].astype(jnp.uint8), tb_ok

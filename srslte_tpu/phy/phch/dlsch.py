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


def _derm_clusters(llr, cfg: DlschConfig):
    """De-rate-match ALL code blocks sharing a K in one gather.

    Returns [(K, f0, w [..., C, 3*(K+4)])] in transport-block order.  The
    per-CB inverse maps (different E, offsets into the concatenated llr,
    fillers) are folded into one constant index tensor so a whole TB needs
    one gather + one turbo batch per distinct K (36.212 orders K- blocks
    before K+, so cluster concatenation preserves TB order).
    """
    import jax.numpy as jnp

    clusters: dict[int, list] = {}
    pos = 0
    for g in cfg.groups:
        for i in range(g.count):
            f = g.F if (g.first_r == 0 and i == 0) else 0
            clusters.setdefault(g.K, []).append((pos, g.E, f))
            pos += g.E
    out = []
    for K, cbs in clusters.items():
        J = 3 * (K + 4)
        invs = []
        for (off, E, f) in cbs:
            inv, r = turbo._rm_rx_inverse(K, E, cfg.rv, f, None)
            invs.append((off, inv, f))
        rmax = max(i.shape[1] for _, i, _ in invs)
        IDX = np.zeros((len(cbs), J, rmax), np.int32)
        MASK = np.zeros((len(cbs), J, rmax), np.float32)
        FILL = np.zeros((len(cbs), J), np.float32)
        for c, (off, inv, f) in enumerate(invs):
            r = inv.shape[1]
            IDX[c, :, :r] = off + np.maximum(inv, 0)
            MASK[c, :, :r] = inv >= 0
            if f > 0:
                FILL[c, :f] = -1e4  # d0 fillers are known zeros
        w = jnp.sum(llr[..., jnp.asarray(IDX)] * jnp.asarray(MASK), axis=-1)
        out.append((K, cbs[0][2], w + jnp.asarray(FILL)))
    return out


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
    # cascade: early -> +1 -> compacted rest.  Measured at the benchmark
    # operating point (16 dB, rate-0.92 64QAM): CB failure is ~99% after 1
    # iteration but ~5% after 2, so one extra full-batch iteration puts the
    # survivors inside the compact capacity and the remaining n_iter-2
    # iterations run on ~1/compact_frac of the blocks.
    mid = min(n_iter, early + 1)
    for K, f0, w in _derm_clusters(llr, cfg):
        # w [..., C, 3(K+4)]: all same-K code blocks decode as ONE batch —
        # 36.212 bit selection usually splits a TB into two E sizes, and
        # separate per-E decodes would double every kernel/cascade instance
        count = w.shape[-2]
        flat = w.reshape((-1, w.shape[-1]))  # [Ng, 3(K+4)]
        ng = int(np.prod(batch)) * count

        if seg.C > 1:
            cpoly, corder = crcmod.LTE_CRC24B
            cb_ok = lambda h: crcmod.crc_ok_device(h, cpoly, corder)
        else:
            cpoly, corder = crcmod.LTE_CRC24A
            cb_ok = lambda h, f0=f0: crcmod.crc_ok_device(h[..., f0:], cpoly,
                                                          corder)
        cap = max(1, -(-ng // compact_frac))

        # Decoder adapter: on the Pallas path the prepared window tensors /
        # extrinsics thread through the phases as a resumable TurboState
        # (tdec.turbo_start/step/hard/take) — re-preparing them from the
        # dcat LLRs at every phase costs more than a whole iteration.  The
        # XLA-scan fallback threads the decoder-1 a-priori instead.
        from ..fec import tdec

        if tdec.state_supported(K):
            def dec_init(n):
                st = tdec.turbo_step(tdec.turbo_start(flat, K), K, n,
                                     first=True)
                return tdec.turbo_hard(st, K)[0], st

            def dec_more(st, n):
                st = tdec.turbo_step(st, K, n)
                return tdec.turbo_hard(st, K)[0], st

            def dec_take(st, idx):
                return tdec.turbo_take(st, idx, K)
        else:
            def dec_init(n):
                hard, _, apr = turbo_decode(flat, K, n_iter=n,
                                            return_state=True)
                return hard, (flat, apr)

            def dec_more(st, n):
                f, a = st
                hard, _, apr = turbo_decode(f, K, n_iter=n, apr0=a,
                                            return_state=True)
                return hard, (f, apr)

            def dec_take(st, idx):
                return (st[0][idx], st[1][idx])

        # phase 1: `early` iterations on everything (clean channels exit here)
        hard1, st1 = dec_init(early)
        ok1 = cb_ok(hard1)

        def phases23(hard1=hard1, ok1=ok1, st1=st1, K=K):
            # phase 2: resume the SAME decoder state for mid-early more
            # iterations (warm start — equals a `mid`-iteration decode)
            hard2, st2 = dec_more(st1, mid - early)
            if mid >= n_iter:
                return hard2
            ok2 = cb_ok(hard2)
            order = jnp.argsort(ok2.astype(jnp.int32), stable=True)
            idx = order[:cap]
            nfail = jnp.sum(jnp.logical_not(ok2))

            def compact():
                # phase 3: survivors only, resumed — one iteration at a
                # time with a second, 4x-deeper compaction for stragglers
                # (post-3-iteration failure is ~1e-4 of CBs at the operating
                # point, so the n_iter ceiling runs on ~cap/4 blocks)
                st3 = dec_take(st2, idx)
                hard3, st3 = dec_more(st3, 1)
                if n_iter - mid > 1:
                    ok3 = cb_ok(hard3)
                    cap2 = max(1, cap // 4)
                    idx3 = jnp.argsort(ok3.astype(jnp.int32), stable=True)[:cap2]
                    nfail3 = jnp.sum(jnp.logical_not(ok3))

                    def deeper(hard3=hard3, st3=st3, ok3=ok3, idx3=idx3):
                        hard4, _ = dec_more(dec_take(st3, idx3),
                                            n_iter - mid - 1)
                        keep3 = ok3[idx3][:, None]
                        return hard3.at[idx3].set(
                            jnp.where(keep3, hard3[idx3], hard4))

                    def full3(st3=st3):
                        return dec_more(st3, n_iter - mid - 1)[0]

                    hard3 = jax.lax.cond(
                        nfail3 == 0, lambda: hard3,
                        lambda: jax.lax.cond(nfail3 <= cap2, deeper, full3))
                keep = ok2[idx][:, None]
                return hard2.at[idx].set(jnp.where(keep, hard2[idx], hard3))

            def full():
                return dec_more(st2, n_iter - mid)[0]

            return jax.lax.cond(
                nfail == 0, lambda: hard2,
                lambda: jax.lax.cond(nfail <= cap, compact, full))

        hard = jax.lax.cond(jnp.all(ok1), lambda: hard1, phases23)
        hard = hard.reshape(batch + (count, K))
        cb_crc = 24 if seg.C > 1 else 0
        if seg.C > 1:
            pb, po = crcmod.LTE_CRC24B
            ok_parts.append(crcmod.crc_ok_device(hard, pb, po))
        # per-CB payload extraction: only the first CB of the TB carries
        # filler bits (f0 applies to cluster-local CB 0 iff it is TB CB 0)
        for c in range(count):
            f_c = f0 if c == 0 else 0
            parts.append(hard[..., c, f_c : K - cb_crc])

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

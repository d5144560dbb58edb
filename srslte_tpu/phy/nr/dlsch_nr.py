"""NR DL-SCH / UL-SCH coding chain (38.212 §5.2.2/§5.4.2/§7.2.4).

Reference behavior: lib/src/phy/phch/sch_nr.c — TB CRC (24A / 16),
base-graph selection, LDPC code-block segmentation with per-CB CRC24B and
fillers, per-CB rate matching (E split, rv, Qm interleaving), concatenation.

TPU-first like the LTE sch: static shapes per (tbs, R, G, Qm) bucket, all
code blocks of a TB decode as one LDPC batch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ...utils.jit import lazy_jit
from ..fec import crc as crcmod
from ..fec.ldpc import (LdpcGraph, ldpc_decode, ldpc_encode, ldpc_rm_rx,
                        ldpc_rm_tx, valid_lifting_sizes)


def select_bg(a: int, rate: float) -> int:
    """Base-graph selection (38.212 §7.2.2)."""
    if a <= 292 or (a <= 3824 and rate <= 0.67) or rate <= 0.25:
        return 2
    return 1


@dataclass(frozen=True)
class NrCbSegm:
    bg: int
    C: int
    zc: int
    K: int  # per-CB systematic length (incl. fillers + CB CRC)
    K_prime: int  # per-CB info bits (incl. CB CRC, excl. fillers)
    F: int  # filler bits per CB
    tb_crc_len: int
    cb_crc_len: int


def nr_cbsegm(a: int, rate: float) -> NrCbSegm:
    """38.212 §5.2.2 segmentation for TB size `a` (payload bits)."""
    bg = select_bg(a, rate)
    tb_crc = 24 if a > 3824 else 16
    b = a + tb_crc
    kcb = 8448 if bg == 1 else 3840
    if b <= kcb:
        c, l_cb, b_prime = 1, 0, b
    else:
        l_cb = 24
        c = -(-b // (kcb - l_cb))
        b_prime = b + c * l_cb
    k_prime = -(-b_prime // c)
    if bg == 1:
        kb = 22
    else:
        kb = 10 if b > 640 else 9 if b > 560 else 8 if b > 192 else 6
    zc = min(z for z in valid_lifting_sizes() if kb * z >= k_prime)
    k = (22 if bg == 1 else 10) * zc
    return NrCbSegm(bg=bg, C=c, zc=zc, K=k, K_prime=k_prime, F=k - k_prime,
                    tb_crc_len=tb_crc, cb_crc_len=l_cb)


@dataclass(frozen=True)
class NrDlschConfig:
    """Static bucket for one NR transport block."""

    tbs: int
    G: int
    Qm: int
    rate: float  # target code rate (drives BG selection)
    rv: int = 0
    n_layers: int = 1

    @functools.cached_property
    def seg(self) -> NrCbSegm:
        return nr_cbsegm(self.tbs, self.rate)

    @functools.cached_property
    def graph(self) -> LdpcGraph:
        return LdpcGraph(self.seg.bg, self.seg.zc)

    @functools.cached_property
    def e_per_cb(self) -> tuple:
        """E_r per code block (38.212 §5.4.2.1 split)."""
        s = self.seg
        unit = self.n_layers * self.Qm
        gp = self.G // unit
        lo = unit * (gp // s.C)
        hi = unit * (-(-gp // s.C))
        gamma = gp % s.C
        return tuple(lo if r <= s.C - gamma - 1 else hi for r in range(s.C))


def nr_dlsch_encode(bits, cfg: NrDlschConfig):
    """bits [..., tbs] -> coded [..., G] uint8 (jittable)."""
    import jax.numpy as jnp

    s = cfg.seg
    poly = crcmod.LTE_CRC24A if s.tb_crc_len == 24 else crcmod.LTE_CRC16
    ga = jnp.asarray(crcmod.crc_matrix(cfg.tbs, *poly), jnp.int8)
    tb_crc = jnp.matmul(bits.astype(jnp.int8), ga,
                        preferred_element_type=jnp.int32) & 1
    b = jnp.concatenate([bits.astype(jnp.int32), tb_crc], axis=-1)

    data_per_cb = s.K_prime - s.cb_crc_len
    outs = []
    for r in range(s.C):
        cb = b[..., r * data_per_cb : (r + 1) * data_per_cb]
        if s.cb_crc_len:
            pb = crcmod.LTE_CRC24B
            gb = jnp.asarray(crcmod.crc_matrix(data_per_cb, *pb), jnp.int8)
            cbc = jnp.matmul(cb.astype(jnp.int8), gb,
                             preferred_element_type=jnp.int32) & 1
            cb = jnp.concatenate([cb, cbc], axis=-1)
        if s.F:
            cb = jnp.concatenate(
                [cb, jnp.zeros(cb.shape[:-1] + (s.F,), jnp.int32)], axis=-1)
        cw = ldpc_encode(cb.astype(jnp.uint8), cfg.graph)
        outs.append(ldpc_rm_tx(cw, cfg.graph, cfg.e_per_cb[r], cfg.rv,
                               cfg.Qm, s.K_prime))
    return jnp.concatenate(outs, axis=-1).astype(jnp.uint8)


def nr_dlsch_combine(llr, cfg: NrDlschConfig, state=None):
    """Scatter llr [..., G] into full-codeword softbuffers [..., C, n_full].

    state is a previous softbuffer to IR-combine into (HARQ retransmission
    with cfg.rv of THIS transmission), or None for a first transmission.
    Analog of srsran softbuffer + ldpc_rm.c combining (dl_harq_nr.cc keeps
    one softbuffer per process and rate matching adds into it).
    """
    import jax.numpy as jnp

    s = cfg.seg
    ws, pos = [], 0
    for r in range(s.C):
        e = cfg.e_per_cb[r]
        # the filler-bit prior is already in `state` on retransmissions
        w = ldpc_rm_rx(llr[..., pos : pos + e], cfg.graph, cfg.rv, cfg.Qm,
                       s.K_prime, fill_val=(0.0 if state is not None
                                            else -1e4))
        pos += e
        ws.append(w)
    w = jnp.stack(ws, axis=-2)
    return w if state is None else state + w


def nr_dlsch_decode_state(w, cfg: NrDlschConfig, n_iter: int = 10):
    """Decode softbuffers [..., C, n_full] -> (bits [..., tbs], ok [...])."""
    import jax.numpy as jnp

    s = cfg.seg
    data_per_cb = s.K_prime - s.cb_crc_len
    hard, ok_pc = ldpc_decode(w, cfg.graph, n_iter=n_iter)  # [..., C, K..]
    cb = hard[..., : s.K_prime]
    if s.cb_crc_len:
        ok_cb = crcmod.crc_ok_device(cb, *crcmod.LTE_CRC24B) & ok_pc
        cb = cb[..., :data_per_cb]
    else:
        ok_cb = ok_pc
    b = cb.reshape(cb.shape[:-2] + (s.C * data_per_cb,))
    poly = crcmod.LTE_CRC24A if s.tb_crc_len == 24 else crcmod.LTE_CRC16
    ok = crcmod.crc_ok_device(b, *poly)
    ok = jnp.logical_and(ok, jnp.all(ok_cb, -1))
    return b[..., : cfg.tbs].astype(jnp.uint8), ok


def nr_dlsch_decode(llr, cfg: NrDlschConfig, n_iter: int = 10):
    """llr [..., G] (positive => bit 1) -> (bits [..., tbs], ok [...])."""
    return nr_dlsch_decode_state(nr_dlsch_combine(llr, cfg), cfg,
                                 n_iter=n_iter)

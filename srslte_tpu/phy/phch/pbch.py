"""PBCH: broadcast channel carrying the MIB (36.211 §6.6, 36.212 §5.3.1).

Reference behavior: lib/src/phy/phch/pbch.c — MIB pack (srsran_pbch_mib_pack),
CRC16 masked by the antenna-port pattern (36.212 table 5.3.1.1-1), K=7
tail-biting convolutional code, rate matching to 1920 bits (normal CP),
cell-id scrambling reset every 4 frames, QPSK, SFBC, mapping to slot 1
symbols 0-3 of subframe 0 over the center 72 subcarriers skipping 4-port CRS
positions; decode tries every (frame-phase, antenna-count) hypothesis
(srsran_pbch_decode:444).

TPU-first: all 4 frame phases x {1,2} antenna hypotheses decode as ONE
batched Viterbi pass + one batched CRC matmul; the reference's nested
hypothesis loops collapse into a [8, ...] leading axis and an argmax.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ...utils.jit import lazy_jit
from ..common.params import CP, Cell
from ..common.sequence import gold_sequence, gold_sequence_signed
from ..fec.convolutional import (conv_encode_np, rm_conv_indices, rm_conv_rx,
                                 viterbi_decode)
from ..fec.crc import LTE_CRC16, crc_attach, crc_bits, crc_matrix
from ..mimo import alamouti_decode_2tx, alamouti_encode_2tx, equalize_zf
from ..mimo.mimo import alamouti_decode_4tx, alamouti_encode_4tx
from ..modem.modem import Modulation, demod_soft, modulate

MIB_LEN = 24
PAYLOAD = MIB_LEN + 16  # with CRC
_BW_IDX = {6: 0, 15: 1, 25: 2, 50: 3, 75: 4, 100: 5}
_BW_REV = {v: k for k, v in _BW_IDX.items()}
_RES_IDX = {"1/6": 0, "1/2": 1, "1": 2, "2": 3}
_RES_REV = {v: k for k, v in _RES_IDX.items()}


def ant_mask(nof_ports: int) -> np.ndarray:
    """CRC mask per 36.212 table 5.3.1.1-1."""
    if nof_ports == 1:
        return np.zeros(16, np.uint8)
    if nof_ports == 2:
        return np.ones(16, np.uint8)
    return np.tile(np.array([0, 1], np.uint8), 8)


@dataclass(frozen=True)
class Mib:
    n_prb: int
    phich_length: str
    phich_resources: str
    sfn: int  # multiple of 4 (the 2 LSBs come from the decoded frame phase)

    def pack(self) -> np.ndarray:
        bits = np.zeros(MIB_LEN, np.uint8)
        bw = _BW_IDX[self.n_prb]
        bits[0:3] = [(bw >> i) & 1 for i in (2, 1, 0)]
        bits[3] = 0 if self.phich_length == "norm" else 1
        res = _RES_IDX[self.phich_resources]
        bits[4:6] = [(res >> 1) & 1, res & 1]
        sfn8 = (self.sfn >> 2) & 0xFF
        bits[6:14] = [(sfn8 >> i) & 1 for i in range(7, -1, -1)]
        return bits

    @staticmethod
    def unpack(bits: np.ndarray) -> "Mib":
        bw = (bits[0] << 2) | (bits[1] << 1) | bits[2]
        res = (bits[4] << 1) | bits[5]
        sfn8 = 0
        for b in bits[6:14]:
            sfn8 = (sfn8 << 1) | int(b)
        return Mib(n_prb=_BW_REV[int(bw)],
                   phich_length="norm" if bits[3] == 0 else "ext",
                   phich_resources=_RES_REV[int(res)], sfn=sfn8 << 2)


@functools.lru_cache(maxsize=None)
def pbch_re_indices(cell: Cell) -> np.ndarray:
    """Flat subframe-grid indices of the PBCH REs (240 normal / 216 ext CP).

    Slot 1 symbols 0-3, center 72 subcarriers, skipping the 4-port CRS
    pattern (k mod 3 == cell_id mod 3) regardless of actual port count
    (36.211 §6.6.4).  Normal CP: CRS live in symbols 0-1 of the PBCH block;
    extended CP: ports 0/1 fall on symbols 0 and 3, ports 2/3 on symbol 1,
    so symbols 0, 1 and 3 are punctured (pbch.c PBCH_RE_EXT_CP).
    """
    o = cell.ofdm
    crs_syms = (0, 1) if cell.cp is CP.NORM else (0, 1, 3)
    first = o.nof_re // 2 - 36
    idx = []
    for l in range(4):
        sym = o.nsymb_slot + l
        ks = np.arange(first, first + 72)
        if l in crs_syms:
            ks = ks[ks % 3 != cell.id % 3]
        idx.append(sym * o.nof_re + ks)
    out = np.concatenate(idx).astype(np.int32)
    assert len(out) == (240 if cell.cp is CP.NORM else 216)
    return out


_E_TOTAL = 1920  # normal CP: 4 x 480 coded bits (ext CP: 4 x 432)


def e_total(cell: Cell) -> int:
    return 1920 if cell.cp is CP.NORM else 1728


@functools.lru_cache(maxsize=None)
def _scramble_signed(cell_id: int, e: int = _E_TOTAL) -> np.ndarray:
    return gold_sequence_signed(cell_id, e)


@dataclass(frozen=True)
class Pbch:
    cell: Cell

    @functools.cached_property
    def re_idx(self) -> np.ndarray:
        return pbch_re_indices(self.cell)

    def encode_frame(self, mib: Mib, grids):
        """Encode the MIB burst for frame phase (sfn mod 4) into grids.

        grids: subframe-0 grids [..., nports, nsym, nre].  The full 1920-bit
        codeword is regenerated host-side per 4-frame period; phase selects
        the 480-bit quarter.
        """
        import jax.numpy as jnp

        phase = (mib.sfn % 4)
        e = e_total(self.cell)
        q = e // 4
        msg = mib.pack()
        crc = crc_bits(msg, *LTE_CRC16) ^ ant_mask(self.cell.nof_ports)
        payload = np.concatenate([msg, crc])
        # host-side codeword (config-plane data; keeps encode_frame jittable)
        coded = conv_encode_np(payload)[rm_conv_indices(3 * PAYLOAD, e)]
        scr = coded ^ gold_sequence(self.cell.id, e)
        quarter = jnp.asarray(scr[q * phase : q * (phase + 1)])
        sym = modulate(quarter, Modulation.QPSK)  # [240] (216 ext CP)
        o = self.cell.ofdm
        idx = jnp.asarray(self.re_idx)
        flat = grids.reshape(grids.shape[:-2] + (o.nsymb_sf * o.nof_re,))
        if self.cell.nof_ports == 1:
            flat = flat.at[..., 0, idx].set(sym)
        elif self.cell.nof_ports == 2:
            tx = alamouti_encode_2tx(sym)
            flat = flat.at[..., 0, idx].set(tx[..., 0, :])
            flat = flat.at[..., 1, idx].set(tx[..., 1, :])
        elif self.cell.nof_ports == 4:
            tx = alamouti_encode_4tx(sym)
            for p in range(4):
                flat = flat.at[..., p, idx].set(tx[..., p, :])
        else:
            raise ValueError(f"bad port count {self.cell.nof_ports}")
        return flat.reshape(grids.shape)

    def decode(self, grid, ce):
        """Single-frame blind decode over (phase, ports) hypotheses.

        grid [nsym, nre], ce [nports_est>=2, nsym, nre] (estimate CRS for 2
        ports; the 1-port hypothesis uses ce[0] only).
        Returns (ok, mib_bits[40], phase, nof_ports) — host values after one
        batched device dispatch (mib bits are the decoded 24+16 payload, CRC
        already checked against the winning antenna mask).
        """
        import numpy as np

        ok, bits, win = self._decode_dev(grid, ce)
        win = int(np.asarray(win))
        return (bool(np.asarray(ok)), np.asarray(bits),
                win % 4, (1, 2, 4)[win // 4])

    @lazy_jit(static_argnums=(0,))
    def _decode_dev(self, grid, ce):
        """All (phase x ports) hypotheses in one dispatch -> (any_ok, bits, win).

        Port hypotheses 1/2 always; 4 when ce carries 4 estimated ports
        (pbch.c srsran_pbch_decode:444 tries nant in {1, 2, 4}).
        """
        import jax.numpy as jnp

        e = e_total(self.cell)
        q = e // 4
        idx = jnp.asarray(self.re_idx)
        y = grid.reshape(-1)[idx]
        h0 = ce[0].reshape(-1)[idx]
        h1 = ce[1].reshape(-1)[idx]
        x1 = equalize_zf(y, h0)
        x2 = alamouti_decode_2tx(y, h0, h1)
        hyps = [demod_soft(x1, Modulation.QPSK),
                demod_soft(x2, Modulation.QPSK)]
        ports = [1, 2]
        if ce.shape[0] >= 4:
            h4 = jnp.stack([ce[p].reshape(-1)[idx] for p in range(4)], axis=-2)
            x4, _ = alamouti_decode_4tx(y, h4)
            hyps.append(demod_soft(x4, Modulation.QPSK))
            ports.append(4)
        nh = len(hyps)
        llr_hyp = jnp.stack(hyps)  # [nh, q]
        s = jnp.asarray(_scramble_signed(self.cell.id, e))
        # place the quarter LLRs at each of the 4 offsets of the e buffer
        buf = jnp.zeros((nh, 4, e), jnp.float32)
        for ph in range(4):
            buf = buf.at[:, ph, q * ph : q * (ph + 1)].set(llr_hyp)
        buf = (buf * s).reshape(nh * 4, e)
        de_rm = rm_conv_rx(buf, 3 * PAYLOAD)  # [nh*4, 120]
        bits = viterbi_decode(de_rm, PAYLOAD)  # [nh*4, 40]
        g = jnp.asarray(crc_matrix(MIB_LEN, *LTE_CRC16), jnp.int8)
        calc = jnp.matmul(bits[:, :MIB_LEN].astype(jnp.int8), g,
                          preferred_element_type=jnp.int32) & 1
        rx = bits[:, MIB_LEN:].astype(jnp.int32)
        masks = jnp.asarray(np.stack([ant_mask(p) for p in ports]), jnp.int32)
        ok = jnp.all(calc == (rx ^ masks[jnp.arange(nh * 4) // 4]), axis=-1)
        win = jnp.argmax(ok)
        return jnp.any(ok), bits[win], win

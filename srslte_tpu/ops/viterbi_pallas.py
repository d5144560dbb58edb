"""Pallas TPU kernel: batched K=7 tail-biting Viterbi decoder.

Reference behavior: lib/src/phy/fec/convolutional/viterbi.c (decode37,
tail-biting wrap viterbi.c:66-71).  The XLA scan version
(fec/convolutional.py viterbi_decode) pays per-step while-loop overhead on
~50 µs scale for 3*L tiny ACS steps — two orders of magnitude above the ALU
cost.  This kernel statically unrolls the whole trellis like the turbo SISO
kernel (tdec_pallas.py): every step's VMEM addressing is a trace-time
constant, there is no in-kernel control flow at all.

Layout: one program decodes TILE = 8*128 candidates (a full f32 vreg per
trellis state).  The 64 path metrics are 64 separate (8, 128) arrays —
plain Python list indexing at trace time; Mosaic spills what doesn't fit
the register file to VMEM, which costs a load/store, not a shuffle.

Decisions are bit-PACKED: the 64 per-state decision bits of one step are 8
f32 rows (8 states per float, values 0..255 exact), so the survivor memory
for 132 steps is 132*8 vregs of VMEM instead of 132*64.

Traceback runs in-kernel, backwards over the same unrolled steps, entirely
in f32 arithmetic (states are small exact integers in f32):
  pred = (s' mod 32)*2 + decision_bit(s'), input bit u = (s' >= 32).
The per-lane dynamic "dec[t][state]" read is a one-hot 8-row select of the
packed row + an arithmetic bit extract — no per-lane gather exists on the
VPU, so indexing is replaced by compare/FMA trees.

Tail-biting is handled as in the reference: the input is repeated 3x and
the middle copy's bits are emitted (only positions [L, 2L) are stored).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB, LANE = 8, 128
TILE = SUB * LANE

_NSTATES = 64
_GENS = (0o133, 0o171, 0o165)


@functools.lru_cache(maxsize=1)
def _tables():
    from ..phy.fec.convolutional import _pred_tables

    pred, u_in, br = _pred_tables()  # [64,2], [64], [64,2,3]
    # branch metric sign pattern: +1 where coded bit 1 (LLR positive => 1)
    sgn = 2.0 * br - 1.0  # [64, 2, 3]
    return pred, u_in, sgn


def _viterbi_kernel(T: int, L: int, emit_lo: int, emit_hi: int,
                    known_start: bool = False):
    """T total trellis steps; emit bits for t in [emit_lo, emit_hi).

    known_start pins the initial state to 0 (non-tail-biting); tail-biting
    starts uniform (viterbi.c wrap-around scheme)."""
    pred, u_in, sgn = _tables()

    def kernel(llr_ref, bits_ref, dec_scr):
        # --- forward ACS, statically unrolled --------------------------------
        init = -1e9 if known_start else 0.0
        m = [jnp.zeros((SUB, LANE), jnp.float32)] + [
            jnp.full((SUB, LANE), init, jnp.float32) for _ in range(_NSTATES - 1)]
        for t in range(T):
            y0 = llr_ref[t, 0, 0]
            y1 = llr_ref[t, 1, 0]
            y2 = llr_ref[t, 2, 0]
            # the 8 possible branch metrics ±y0±y1±y2, built from 4 + negation
            g = {}
            for s0 in (1.0, -1.0):
                for s1 in (1.0, -1.0):
                    for s2 in (1.0, -1.0):
                        key = (s0, s1, s2)
                        if (-s0, -s1, -s2) in g:
                            g[key] = -g[(-s0, -s1, -s2)]
                        else:
                            g[key] = s0 * y0 + s1 * y1 + s2 * y2
            new = []
            packed = [None] * 8
            for sp in range(_NSTATES):
                (pA, pB) = int(pred[sp, 0]), int(pred[sp, 1])
                gA = g[tuple(sgn[sp, 0])]
                gB = g[tuple(sgn[sp, 1])]
                a = m[pA] + gA
                b = m[pB] + gB
                new.append(jnp.maximum(a, b))
                bit = (b > a).astype(jnp.float32)  # decision: 1 -> pred B
                grp, off = sp // 8, sp % 8
                contrib = bit * float(1 << off)
                packed[grp] = contrib if packed[grp] is None \
                    else packed[grp] + contrib
            for grp in range(8):
                dec_scr[t, grp] = packed[grp]
            m = new

        # --- best end state (tail-biting: argmax over all states) ------------
        best_m = m[0]
        best_s = jnp.zeros((SUB, LANE), jnp.float32)
        for s in range(1, _NSTATES):
            take = (m[s] > best_m).astype(jnp.float32)
            best_m = jnp.maximum(best_m, m[s])
            best_s = best_s * (1.0 - take) + float(s) * take

        # --- traceback, unrolled backwards ------------------------------------
        state = best_s  # state AFTER step t (exact small ints in f32)
        for t in range(T - 1, -1, -1):
            # u emitted at step t = MSB of the state after step t
            if emit_lo <= t < emit_hi:
                bits_ref[t - emit_lo, 0] = (state >= 32.0).astype(jnp.float32)
            # packed decision row of this state's group
            grp = jnp.floor(state * 0.125)
            row = jnp.zeros((SUB, LANE), jnp.float32)
            for gI in range(8):
                sel = (grp == float(gI)).astype(jnp.float32)
                row = row + sel * dec_scr[t, gI]
            off = state - grp * 8.0  # state mod 8, 0..7
            # bit = floor(row / 2^off) mod 2, via an 8-way arithmetic select
            bit = jnp.zeros((SUB, LANE), jnp.float32)
            for o in range(8):
                shifted = jnp.floor(row * float(0.5 ** o))
                b_o = shifted - 2.0 * jnp.floor(shifted * 0.5)
                sel = (off == float(o)).astype(jnp.float32)
                bit = bit + sel * b_o
            # pred = (state mod 32)*2 + decision bit
            low5 = state - 32.0 * jnp.floor(state * 0.03125)
            state = low5 * 2.0 + bit

    return kernel


@functools.partial(jax.jit, static_argnames=("length", "tail_biting"))
def viterbi_decode_pallas(llr, length: int, tail_biting: bool = True):
    """Batched Viterbi: llr [B, 3*length] (positive => bit 1) -> [B, length].

    Drop-in for fec.convolutional.viterbi_decode on the TPU fast path.
    Tail-biting repeats the sequence TB_ITER=3 times and keeps the middle
    copy (viterbi.c:66-71); non-tail-biting runs one copy from state 0 —
    here approximated by the same all-zero init (metrics are relative).
    """
    from ..phy.fec.convolutional import TB_ITER

    B = llr.shape[0]
    reps = TB_ITER if tail_biting else 1
    T = reps * length
    emit_lo = (TB_ITER // 2) * length if tail_biting else 0
    emit_hi = emit_lo + length

    n_pad = -(-B // TILE) * TILE
    NP = n_pad // TILE
    x = llr.astype(jnp.float32).reshape(B, length, 3)
    if tail_biting:
        x = jnp.concatenate([x] * TB_ITER, axis=1)  # [B, T, 3]
    # -> [T, 3, N] step-major
    g = x.reshape(B, T * 3).T.reshape(T, 3, B)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, n_pad - B)))
    g = g.reshape(T, 3, NP, SUB, LANE)

    bits = pl.pallas_call(
        _viterbi_kernel(T, length, emit_lo, emit_hi,
                        known_start=not tail_biting),
        interpret=jax.default_backend() != "tpu",
        grid=(NP,),
        in_specs=[pl.BlockSpec((T, 3, 1, SUB, LANE), lambda i: (0, 0, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((length, 1, SUB, LANE), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((length, NP, SUB, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T, 8, SUB, LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=int(n_pad * T * 400),
            bytes_accessed=int(n_pad * T * 16),
            transcendentals=0),
    )(g)
    out = bits.reshape(length, n_pad)[:, :B].T  # [B, length]
    return out.astype(jnp.uint8)

"""Tail-biting convolutional code K=7 rate 1/3 + Viterbi decoder (36.212 §5.1.3.1).

Reference behavior: lib/src/phy/fec/convolutional/{convcoder.c, viterbi.c,
viterbi37_port.c}.  Generators G = (133, 171, 165) octal; tail-biting decode
follows the reference's wrap-around scheme (viterbi.c:66-71): repeat the
received sequence TB_ITER=3 times, run one Viterbi pass, keep the middle copy.

TPU-first: the encoder is a GF(2) matmul per static length bucket (tail-biting
keeps it linear); the decoder is a batched add-compare-select lax.scan over
[B, 64] path metrics with survivor decisions stored per step, then a gather
traceback scan.  Throughput comes from batching many blocks (e.g. all PDCCH
blind-search candidates at once, SURVEY.md §7.6).
"""

from __future__ import annotations

import functools

import numpy as np

K_CONV = 7
RATE = 3
GENS = (0o133, 0o171, 0o165)
TB_ITER = 3

_NSTATES = 64


def _parity(x: np.ndarray) -> np.ndarray:
    x = x ^ (x >> 4)
    x = x ^ (x >> 2)
    x = x ^ (x >> 1)
    return x & 1


@functools.lru_cache(maxsize=1)
def _branch_tables():
    """OUT[u, s, 3] output bits and NEXT[u, s] for reg = (u<<6)|s, s MSB-newest."""
    u = np.arange(2)[:, None]
    s = np.arange(_NSTATES)[None, :]
    reg = (u << 6) | s
    out = np.stack([_parity(reg & g) for g in GENS], axis=-1)  # [2, 64, 3]
    nxt = ((u << 5) | (s >> 1)).astype(np.int32)  # [2, 64]
    return out.astype(np.int32), nxt


def conv_encode_np(bits: np.ndarray) -> np.ndarray:
    """Host tail-biting encoder: bits [..., L] -> coded [..., 3L].

    Initial state = last 6 input bits (convcoder.c:50-56), so the trellis
    starts and ends in the same state.
    """
    out_tab, nxt = _branch_tables()
    L = bits.shape[-1]
    # state s holds (c_{i-1}..c_{i-6}), newest at bit 5
    state = np.zeros(bits.shape[:-1], np.int32)
    for i in range(L - 6, L):
        state = (state >> 1) | (bits[..., i].astype(np.int32) << 5)
    out = np.empty(bits.shape[:-1] + (3 * L,), np.uint8)
    for i in range(L):
        u = bits[..., i].astype(np.int32)
        out[..., 3 * i : 3 * i + 3] = out_tab[u, state]
        state = nxt[u, state]
    return out


@functools.lru_cache(maxsize=None)
def _encoder_matrix(length: int) -> np.ndarray:
    eye = np.eye(length, dtype=np.uint8)
    return conv_encode_np(eye)


def conv_encode(bits, length: int):
    """Device encoder: one int8 matmul (linear incl. tail-biting init)."""
    import jax.numpy as jnp

    g = jnp.asarray(_encoder_matrix(length), jnp.int8)
    return (jnp.matmul(bits.astype(jnp.int8), g, preferred_element_type=jnp.int32) & 1).astype(jnp.uint8)


@functools.lru_cache(maxsize=1)
def _pred_tables():
    """For each state s': predecessors s = ((s'&0x1F)<<1)|b, input u = s'>>5."""
    sp = np.arange(_NSTATES)
    pred = np.stack([((sp & 0x1F) << 1) | b for b in (0, 1)], axis=1)  # [64, 2]
    u_in = (sp >> 5).astype(np.int32)  # [64]
    out_tab, _ = _branch_tables()
    # branch output bits for arriving at s' from pred b: OUT[u(s'), pred]
    br = out_tab[u_in[:, None], pred]  # [64, 2, 3]
    return pred.astype(np.int32), u_in, br.astype(np.float32)


@functools.lru_cache(maxsize=1)
def _pred4_tables():
    """Radix-4 (two-trellis-steps-merged) predecessor tables.

    For each final state s'' and decision j = (b2<<1)|b1: the state two
    steps back PRE[s'', j], and the 6 coded bits BR6[s'', j, 6] emitted on
    the two transitions.  The input bits are recovered in traceback from
    u_in: bit at the second step = u_in[s''], at the first = u_in[mid].
    """
    out_tab, _ = _branch_tables()
    u_in = (np.arange(_NSTATES) >> 5).astype(np.int32)
    sp = np.arange(_NSTATES)[:, None]  # final state s''
    j = np.arange(4)[None, :]
    b2, b1 = j >> 1, j & 1
    mid = ((sp & 0x1F) << 1) | b2  # state after the first step [64, 4]
    pre = ((mid & 0x1F) << 1) | b1  # state before both steps [64, 4]
    out1 = out_tab[u_in[mid], pre]  # [64, 4, 3]
    u2 = np.broadcast_to(u_in[sp], (64, 4))
    out2 = out_tab[u2, mid]
    br6 = np.concatenate([out1, out2], axis=-1)  # [64, 4, 6]
    return pre.astype(np.int32), u_in, br6.astype(np.float32)


def _pallas_ok() -> bool:
    import os

    if os.environ.get("SRSLTE_TPU_FORCE_PALLAS", "0") == "1":
        return True
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def viterbi_decode(llr, length: int, tail_biting: bool = True,
                   backend: str = "auto"):
    """Batched soft Viterbi: llr [B, 3L] (positive ⇒ bit 1) -> bits [B, L] uint8.

    Tail-biting wrap-around per viterbi.c: the sequence is processed TB_ITER
    times and the middle copy is returned.

    backend "auto" uses the unrolled Pallas kernel on TPU for 2-D batches
    (ops/viterbi_pallas.py — the XLA scan pays ~50 µs/step of while-loop
    overhead, two orders of magnitude above the ALU cost of one ACS step);
    elsewhere the radix-4 scan below.

    Radix-4: the ACS scan merges two trellis steps per iteration (4
    predecessors, 6 coded bits), halving the sequential depth of both the
    forward scan and the traceback — the latency term that dominates the
    batched PDCCH blind search.  An odd first step falls back to radix-2.
    """
    import jax
    import jax.numpy as jnp

    if llr.ndim == 2 and (backend == "pallas"
                          or (backend == "auto" and _pallas_ok())):
        from ...ops.viterbi_pallas import viterbi_decode_pallas

        return viterbi_decode_pallas(llr, length, tail_biting)

    pred, u_in, br = _pred_tables()
    pre4, _, br6 = _pred4_tables()
    pre4_j = jnp.asarray(pre4)
    br6_j = jnp.asarray(br6)
    pred_j = jnp.asarray(pred)
    br_j = jnp.asarray(br)  # [64, 2, 3]

    b = llr.shape[0]
    sym = llr.reshape(b, length, 3)
    if tail_biting:
        sym = jnp.concatenate([sym] * TB_ITER, axis=1)
    t_total = sym.shape[1]
    odd = t_total % 2

    def acs(m, y):
        # y: [B, 3]; metric of branch into s' from pred b: sum_k br*y_k
        bm = jnp.einsum("sbk,nk->nsb", br_j, y)  # [B, 64, 2]
        cand = m[:, pred_j] + bm  # [B, 64, 2]
        dec = jnp.argmax(cand, axis=-1)
        new = cand.max(axis=-1)
        new = new - new.max(axis=-1, keepdims=True)
        return new, dec.astype(jnp.int8)

    def acs4(m, y6):
        # y6: [B, 6] the two steps' coded LLRs
        bm = jnp.einsum("sjk,nk->nsj", br6_j, y6)  # [B, 64, 4]
        cand = m[:, pre4_j] + bm
        dec = jnp.argmax(cand, axis=-1)
        new = cand.max(axis=-1)
        new = new - new.max(axis=-1, keepdims=True)
        return new, dec.astype(jnp.int8)

    m0 = jnp.zeros((b, _NSTATES), jnp.float32)
    if not tail_biting:
        m0 = jnp.full((b, _NSTATES), -1e9).at[:, 0].set(0.0)
    dec0 = None
    if odd:
        m0, dec0 = acs(m0, sym[:, 0])
    pairs = sym[:, odd:].reshape(b, (t_total - odd) // 2, 6)
    m_end, decisions = jax.lax.scan(acs4, m0, jnp.moveaxis(pairs, 1, 0))

    best = jnp.argmax(m_end, axis=-1).astype(jnp.int32)  # [B]

    u_in_j = jnp.asarray(u_in)

    def traceback4(state, dec_t):
        # state at the END of the combined step; recover (bit_lo, bit_hi)
        bit_hi = u_in_j[state]
        j = jnp.take_along_axis(dec_t, state[:, None], axis=1)[:, 0].astype(jnp.int32)
        mid = ((state & 0x1F) << 1) | (j >> 1)
        bit_lo = u_in_j[mid]
        prev = ((mid & 0x1F) << 1) | (j & 1)
        return prev, jnp.stack([bit_lo, bit_hi], axis=-1)  # [B, 2]

    state1, bits2_rev = jax.lax.scan(traceback4, best, decisions[::-1])
    # [S4, B, 2] backward -> [B, 2*S4] forward
    bits = bits2_rev[::-1].transpose(1, 0, 2).reshape(b, t_total - odd)
    if odd:
        # bit at time 0 = the input that led into state1 (dec0 only carries
        # the path one step further back, which nothing reads)
        del dec0
        bits = jnp.concatenate([u_in_j[state1][:, None], bits], axis=1)
    bits = bits.astype(jnp.uint8)  # [B, T_total]
    if tail_biting:
        mid = (TB_ITER // 2) * length
        bits = bits[:, mid : mid + length]
    return bits


# ---------------------------------------------------- conv rate matching
NCOLS = 32
RM_PERM_CC = np.array([1, 17, 9, 25, 5, 21, 13, 29, 3, 19, 11, 27, 7, 23, 15, 31,
                       0, 16, 8, 24, 4, 20, 12, 28, 2, 18, 10, 26, 6, 22, 14, 30], np.int64)


@functools.lru_cache(maxsize=None)
def rm_conv_indices(coded_len: int, e: int) -> np.ndarray:
    """36.212 §5.1.4.2 conv rate matching: gather table [E] into coded [3D].

    Each of the 3 streams (length D = coded_len/3) is sub-block interleaved
    with the CC permutation; w = [v0; v1; v2]; e cycles skipping dummies.
    """
    d = coded_len // 3
    nrows = -(-d // NCOLS)
    kp = nrows * NCOLS
    nd = kp - d
    pad = np.concatenate([np.full(nd, -1, np.int64), np.arange(d)])
    v = pad.reshape(nrows, NCOLS)[:, RM_PERM_CC].T.reshape(-1)  # [Kp]
    # coded is time-major (convcoder.c output[3i+j]): stream s, pos i -> 3i+s
    w = np.concatenate([np.where(v >= 0, 3 * v + s, -1) for s in range(3)])
    sel = w[w >= 0]
    reps = -(-e // len(sel))
    return np.tile(sel, reps)[:e].astype(np.int32)


def rm_conv_tx(coded, e: int):
    import jax.numpy as jnp

    idx = jnp.asarray(rm_conv_indices(coded.shape[-1], e))
    return coded[..., idx]


@functools.lru_cache(maxsize=None)
def _rm_conv_rx_inverse(coded_len: int, e: int):
    """Inverse of rm_conv_indices as a gather table [coded_len, R]
    (-1 padded) — XLA lowers scatter-add to slow serialized updates, so
    repetition combining becomes a masked gather-sum."""
    idx = rm_conv_indices(coded_len, e)
    counts = np.bincount(idx, minlength=coded_len)
    r = max(1, int(counts.max()))
    inv = np.full((coded_len, r), -1, np.int64)
    fill = np.zeros(coded_len, np.int64)
    for j, pos in enumerate(idx):
        inv[pos, fill[pos]] = j
        fill[pos] += 1
    return inv.astype(np.int32), (inv >= 0).astype(np.float32)


def rm_conv_rx(e_llr, coded_len: int):
    import jax.numpy as jnp

    inv, mask = _rm_conv_rx_inverse(coded_len, e_llr.shape[-1])
    gathered = e_llr[..., jnp.asarray(np.maximum(inv, 0))]
    return jnp.sum(gathered * jnp.asarray(mask), axis=-1).astype(e_llr.dtype)

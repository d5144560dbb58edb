"""BLER-vs-SNR curve generator (turbodecoder_test / ldpc test analog).

Sweeps Eb/N0 for the turbo and LDPC decoders with batched trials per point
(one device dispatch per point) and prints JSON curves — the parity artifact
against the reference's BLER gates (BASELINE.md primary metrics).

Usage: python tools/bler_curve.py [--codec turbo|ldpc] [--k 6144]
           [--trials 200] [--snrs 0.0,0.5,1.0,1.5,2.0]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def turbo_point(k, ebno_db, trials, seed):
    import jax.numpy as jnp

    from srslte_tpu.phy.fec.tdec import turbo_decode
    from srslte_tpu.phy.fec.turbo import turbo_encode_np

    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (trials, k)).astype(np.uint8)
    d = turbo_encode_np(bits).astype(np.float32)
    rate = k / d.shape[-1]
    sigma = np.sqrt(1.0 / (2.0 * rate * 10 ** (ebno_db / 10)))
    llr = (2 * d - 1) + sigma * rng.standard_normal(d.shape).astype(np.float32)
    hard, _ = turbo_decode(jnp.asarray(llr), k, n_iter=6)
    return float((np.asarray(hard) != bits).any(axis=1).mean())


def ldpc_point(zc, ebno_db, trials, seed):
    import jax.numpy as jnp

    from srslte_tpu.phy.fec.ldpc import LdpcGraph, ldpc_decode, ldpc_encode

    g = LdpcGraph(1, zc)
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, (trials, g.k)).astype(np.uint8)
    cw = np.asarray(ldpc_encode(jnp.asarray(bits), g)).astype(np.float32)
    rate = g.k / (g.n_full - 2 * g.zc)
    sigma = np.sqrt(1.0 / (2.0 * rate * 10 ** (ebno_db / 10)))
    llr = (2 * cw - 1) + sigma * rng.standard_normal(cw.shape).astype(np.float32)
    llr[:, : 2 * g.zc] = 0.0
    out, _ = ldpc_decode(jnp.asarray(llr), g, n_iter=12)
    return float((np.asarray(out) != bits).any(axis=1).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--codec", default="turbo", choices=["turbo", "ldpc"])
    ap.add_argument("--k", type=int, default=6144)
    ap.add_argument("--zc", type=int, default=64)
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--snrs", default="0.0,0.5,1.0,1.5,2.0")
    args = ap.parse_args()
    snrs = [float(s) for s in args.snrs.split(",")]
    curve = []
    for i, snr in enumerate(snrs):
        if args.codec == "turbo":
            bler = turbo_point(args.k, snr, args.trials, seed=i)
        else:
            bler = ldpc_point(args.zc, snr, args.trials, seed=i)
        curve.append({"ebno_db": snr, "bler": bler})
        print(json.dumps(curve[-1]), flush=True)
    print(json.dumps({"codec": args.codec, "curve": curve}))


if __name__ == "__main__":
    main()

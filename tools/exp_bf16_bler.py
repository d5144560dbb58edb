"""bf16 vs f32 turbo BLER at the bench operating point (K=6144-class CB,
rate ~0.92, AWGN).  Confirms/denies the extrinsic-growth diagnosis and
tests input clipping as the fix."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from srslte_tpu.phy.fec import turbo
from srslte_tpu.phy.fec.tdec import turbo_decode
from srslte_tpu.phy.fec import crc as crcmod

K = 5824
E = 6648
B = 192
SNR_DB = float(os.environ.get("SNR_DB", "15.0"))

rng = np.random.default_rng(0)
pb, po = crcmod.LTE_CRC24B
bits = rng.integers(0, 2, (B, K - 24)).astype(np.uint8)
msg = np.concatenate([bits, np.stack([crcmod.crc_bits(b, pb, po) for b in bits])], axis=-1)

enc = jax.jit(lambda m: turbo.rm_tx(turbo.turbo_encode(m, K), K, e=E, rv=0, f=0))
coded = np.asarray(enc(jnp.asarray(msg, jnp.int32)))  # [B, E]

# 64QAM-ish LLR scale: x = 1-2b, y = x + n, llr = -2y/sigma^2
sigma = 10 ** (-SNR_DB / 20.0)
y = (1 - 2.0 * coded) + sigma * rng.standard_normal(coded.shape)
llr_e = -2.0 * y / sigma**2  # positive => bit 1 convention

derm = jax.jit(lambda e: turbo.rm_rx(e, K, rv=0, f=0))
w = np.asarray(derm(jnp.asarray(llr_e, jnp.float32)))

def run(tag, dt, n_iter=5, scale=1.0):
    os.environ["SRSLTE_TPU_SISO_DTYPE"] = dt
    x = jnp.asarray(w * scale, jnp.float32)
    f = jax.jit(lambda x: turbo_decode(x, K, n_iter=n_iter)[0])
    hard = np.asarray(jax.block_until_ready(f(x)))
    ok = np.asarray(crcmod.crc_bits(hard[:, :K-24], pb, po) == hard[:, K-24:]).all(axis=-1)
    print(f"{tag}: CB ok {ok.sum()}/{B}", flush=True)
    return ok

print("llr stats: mean|w|", np.abs(w).mean(), "max", np.abs(w).max(), flush=True)
run("f32 n5", "f32")
run("bf16 n5", "bf16")
run("bf16 n5 scaled 1/8", "bf16", scale=0.125)

"""Micro-experiments: permutation gather strategies + CRC matmul dtypes."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def timed(f, *args, reps=10):
    r = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def main():
    from srslte_tpu.phy.fec.turbo import qpp_perm
    from srslte_tpu.phy.fec import crc as crcmod

    Ng, K = 4992, 5824
    pi_np = qpp_perm(K)
    pi = jnp.asarray(pi_np)
    x = jax.random.normal(jax.random.PRNGKey(0), (Ng, K), jnp.float32)

    # 1. plain lane gather
    f1 = jax.jit(lambda x: x[:, pi] + 0.0)
    print(f"lane gather x[:,pi]:        {timed(f1, x)*1e3:.2f} ms")

    # 2. transpose / row-gather / transpose
    f2 = jax.jit(lambda x: (x.T[pi]).T + 0.0)
    print(f"row gather (x.T[pi]).T:     {timed(f2, x)*1e3:.2f} ms")

    # 3. take_along_axis
    f3 = jax.jit(lambda x: jnp.take(x, pi, axis=1) + 0.0)
    print(f"jnp.take axis=1:            {timed(f3, x)*1e3:.2f} ms")

    # 4. one-hot matmul bf16 (exact: one-hot rows have a single 1)
    oh = np.zeros((K, K), np.float32)
    oh[pi_np, np.arange(K)] = 1.0
    ohb = jnp.asarray(oh, jnp.bfloat16)

    def f4(x):
        return jnp.matmul(x.astype(jnp.bfloat16), ohb,
                          preferred_element_type=jnp.float32)
    f4j = jax.jit(f4)
    print(f"one-hot matmul bf16:        {timed(f4j, x)*1e3:.2f} ms")
    # check exactness on values that survive bf16 (use rounded values)
    xr = jnp.round(x * 8) / 8
    assert np.allclose(np.asarray(f4j(xr.astype(jnp.bfloat16).astype(jnp.float32))),
                       np.asarray(xr.astype(jnp.bfloat16).astype(jnp.float32))[:, pi_np])

    # 5. sort-based permute: x[:, pi] == reorder via argsort constant is same gather
    # 6. dynamic_slice-free roll decomposition not applicable (QPP not a roll)

    # CRC variants
    bits = (jax.random.uniform(jax.random.PRNGKey(1), (Ng, K)) < 0.5)
    g_np = crcmod.crc_matrix(K - 24, *[0x1800063, 24][0:1] + [24])
    g_np = crcmod.crc_matrix(K - 24, 0x1800063, 24)

    bi8 = bits.astype(jnp.int8)
    g8 = jnp.asarray(g_np, jnp.int8)
    fc1 = jax.jit(lambda b: (jnp.matmul(b[:, :K-24], g8,
                                        preferred_element_type=jnp.int32) & 1).sum())
    print(f"crc int8 matmul:            {timed(fc1, bi8)*1e3:.2f} ms")

    bf = bits.astype(jnp.float32)
    gf = jnp.asarray(g_np, jnp.float32)
    fc2 = jax.jit(lambda b: (jnp.matmul(b[:, :K-24], gf).astype(jnp.int32) & 1).sum())
    print(f"crc f32 matmul:             {timed(fc2, bf)*1e3:.2f} ms")

    # f32 matmul from uint8 input (conversion cost included)
    bu = bits.astype(jnp.uint8)
    fc3 = jax.jit(lambda b: (jnp.matmul(b[:, :K-24].astype(jnp.float32), gf)
                             .astype(jnp.int32) & 1).sum())
    print(f"crc u8->f32 matmul:         {timed(fc3, bu)*1e3:.2f} ms")

    # pack-to-f32 with padded 128 output cols
    gfp = jnp.pad(gf, ((0, 0), (0, 104)))
    fc4 = jax.jit(lambda b: (jnp.matmul(b[:, :K-24].astype(jnp.float32), gfp)
                             .astype(jnp.int32) & 1).sum())
    print(f"crc u8->f32 matmul pad128:  {timed(fc4, bu)*1e3:.2f} ms")


if __name__ == "__main__":
    main()

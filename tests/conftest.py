"""Test config: force a virtual 8-device CPU platform before JAX import.

Tests validate numerics + multi-chip sharding on CPU; the real-TPU path is
exercised by bench.py / the driver's compile checks.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# jax may already be pre-imported by the interpreter profile (with a TPU
# platform pinned); backend init is lazy, so re-pointing the config still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/pjit paths are
validated on a virtual CPU mesh per the standard JAX recipe. The environment's
sitecustomize force-registers a TPU PJRT plugin and sets JAX_PLATFORMS=axon,
so the env var alone is not enough — we also override via jax.config before
any backend is touched.

Unit tests deliberately run on CPU: they check numerics/shapes/sharding, not
TPU performance (bench.py covers the real chip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware by forcing the host
platform and splitting it into 8 virtual devices (the TPU path is identical
code; only the mesh device list differs).
"""

import os
import sys

# Must be set before jax is imported anywhere. Force (not setdefault): the
# host environment exports JAX_PLATFORMS=axon (the tunneled TPU plugin).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Parity tests compare against fp64 / torch oracles: force exact fp32 matmuls
# and convs (production code uses the fast default MXU precision instead).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

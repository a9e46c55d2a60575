"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware."""

import os

# Force CPU: the ambient environment points JAX_PLATFORMS at the single real
# TPU (axon); tests must not contend for it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

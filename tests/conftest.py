"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware."""

import os

# Force CPU: the ambient environment points JAX_PLATFORMS at the single real
# TPU (axon); tests must not contend for it. The axon site hook imports jax
# at interpreter startup, so the env var alone is too late — update the jax
# config directly as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend, got " + jax.default_backend()
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"

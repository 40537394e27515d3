"""Test configuration: run everything on a virtual 8-device CPU mesh in float64.

The filter's parity gates compare against a float64 NumPy oracle, so tests enable
x64. Multi-chip sharding tests use the 8 virtual CPU devices. TPU benchmarks run
separately (bench.py) in float32 on real hardware.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (the tunneled TPU); the env
# var is merged, not replaced, so force CPU through the config API instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

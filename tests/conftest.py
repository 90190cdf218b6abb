"""Test configuration: run JAX on CPU with 8 virtual devices.

Sharding tests need multiple devices; real TPU hardware in CI has one chip,
so tests force the CPU backend with a virtual 8-device topology
(mirroring how the driver dry-runs the multi-chip path).  The TPU (axon)
PJRT plugin registers itself from sitecustomize regardless of
``JAX_PLATFORMS``, so the platform must also be forced through
``jax.config`` before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test configuration: force CPU with an 8-device virtual mesh.

Device kernels are tested on the CPU backend (SURVEY.md §4 implication:
jax_platforms=cpu makes every kernel testable without a TPU); multi-chip
sharding tests use the 8 virtual host devices.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

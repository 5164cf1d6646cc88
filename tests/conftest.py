"""Test configuration: force CPU with an 8-device virtual mesh.

Device kernels are tested on the CPU backend (SURVEY.md §4 implication:
CPU backend makes every kernel testable without a TPU); multi-chip sharding
tests use the 8 virtual host devices.

NOTE: this environment preloads jax via a sitecustomize (PYTHONPATH
/root/.axon_site) with JAX_PLATFORMS=axon, so setting the env var here is
too late — use jax.config.update, which still works any time before the
first backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

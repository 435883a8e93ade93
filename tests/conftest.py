"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware (SURVEY.md §4).

FORCE (not setdefault): the container's ambient env sets
JAX_PLATFORMS=axon (the tunneled TPU) plus a sitecustomize that dials
the tunnel at first JAX use — a bare `pytest tests/` would otherwise run
the whole suite against the single real chip and intermittently hang.
This must run before anything imports jax, hence conftest top level.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # don't dial the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require TPU hardware: JAX runs on CPU with 8 virtual devices so
the multi-chip sharding layer (mesh + all_to_all corner turn + CFAR halo
exchange) is exercised exactly as the driver's dryrun does.  Must run before
jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

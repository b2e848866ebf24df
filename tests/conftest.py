"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require TPU hardware: JAX runs on CPU with 8 virtual devices so
the multi-chip sharding layer (mesh + all_to_all corner turn + CFAR halo
exchange) is exercised exactly as the driver's dryrun does.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon before pytest starts, so env vars alone don't stick —
XLA_FLAGS must be set before backend init and jax_platforms overridden via
the config API.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables and tracing caches after each test module.

    A full-suite run accumulates gigabytes of live compiled programs across
    ~30 modules; that heap pressure has produced flaky SIGSEGVs inside
    XLA:CPU's compiler on the suite's largest program (the interpret-mode
    fused kernel late in the alphabet) while the identical compile succeeds
    in a fresh process.  Modules don't share compilations anyway, so the
    only cost is recompiling a module's own fixtures."""
    yield
    jax.clear_caches()

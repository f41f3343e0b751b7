"""Test environment: force JAX onto an 8-device virtual CPU mesh.

Must run before any backend initialization. The container's sitecustomize
registers the axon TPU plugin at interpreter start, so we both point
JAX_PLATFORMS at cpu via jax.config (the env var is overridden by the
plugin) and request 8 virtual host devices for sharding tests.
"""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    devs = jax.devices()
    assert devs[0].platform == "cpu", devs
    assert len(devs) == 8, devs


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The suite compiles hundreds of programs; on the 8-virtual-device CPU
    backend the accumulated executables + their thread pools can starve the
    collective rendezvous in later modules (observed as a hard abort in the
    distributed trainer test when run late in the suite)."""
    yield
    jax.clear_caches()

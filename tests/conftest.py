"""Test environment: force JAX onto an 8-device virtual CPU mesh.

Must run before any backend initialization. The container's sitecustomize
registers the axon TPU plugin at interpreter start, so we both point
JAX_PLATFORMS at cpu via jax.config (the env var is overridden by the
plugin) and request 8 virtual host devices for sharding tests.

ADAPROMPT_TEST_PLATFORM=tpu leaves the backend alone (real accelerator) —
used ONLY for the asset-gated real-weight fidelity tier
(tests/test_real_weights.py), whose full-size fp32 DDIM chain is not
CPU-sized. The regular suite always runs on the virtual CPU mesh.
"""

import os

_PLATFORM = os.environ.get("ADAPROMPT_TEST_PLATFORM", "cpu")

if _PLATFORM == "cpu":
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if _PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    if _PLATFORM != "cpu":
        return
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


# fast/slow tiers: these modules dominate the suite wall-clock (measured
# with --durations on a quiet host); `pytest -m 'not slow'` = fast tier
_SLOW_FILES = {
    "test_trainer_mesh.py", "test_trainer.py", "test_unet.py",
    "test_pipeline.py", "test_cli.py", "test_compos_step.py",
    "test_train_steps.py", "test_conditioner.py", "test_vae.py",
    "test_diffusers_port.py", "test_bisenet.py", "test_arcface.py",
    "test_face_tools.py", "test_eval.py", "test_checkpoint.py",
    "test_attention.py", "test_golden_chain.py",
}


# mid tier: the oracle-parity backbone (UNet/trainer/steps) — heavy enough
# to be excluded from the fast tier, core enough that regressions there
# should surface during development, not at round boundaries.
# `pytest -m 'not slow or mid'` = mid tier (~6 min); fast tier ~3 min;
# full suite ~30 min. The mid tier is the pre-commit gate (docs/README).
_MID_FILES = {
    "test_unet.py", "test_trainer.py", "test_train_steps.py",
    "test_attention.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = os.path.basename(str(item.fspath))
        if base in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
        if base in _MID_FILES:
            item.add_marker(pytest.mark.mid)

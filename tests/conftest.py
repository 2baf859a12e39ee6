"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This is the JAX answer to distributed testing without hardware
(SURVEY.md §4): XLA's host platform is split into 8 virtual devices so
sharding/collective logic is exercised by every test run.

NOTE: in this dev environment the axon TPU plugin overrides the
``JAX_PLATFORMS`` env var, so the platform must be pinned via
``jax.config.update`` before the first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (full CLI subprocess runs)")

"""
Test configuration: run everything on a virtual 8-device CPU mesh with
float64 enabled for physics parity (the reference pins float64 in every
test file, e.g. bayeslim/tests/test_rime.py:5).

Note: the sandbox registers a remote TPU ('axon') platform via
sitecustomize and programmatically forces jax_platforms, so the env-var
route (JAX_PLATFORMS=cpu) is not sufficient — we must override the config
after importing jax, before any backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

from _slow_tests import SLOW  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: test measured >=2 s (see tests/_slow_tests.py)")
    config.addinivalue_line(
        "markers", "fast: complement of slow — `-m fast` is the ~2 min "
                   "smoke subset")


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = "tests/" + item.nodeid.split("tests/")[-1] \
            if "tests/" in item.nodeid else "tests/" + item.nodeid
        if nodeid in SLOW:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.fast)

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

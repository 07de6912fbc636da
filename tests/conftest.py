"""Test configuration: run all tests on a simulated 8-device CPU platform
so DP/pjit sharding is exercised without a TPU pod (the JAX-native analogue
of a fake backend — SURVEY.md §4).

Note: the hosted TPU platform plugin ignores the JAX_PLATFORMS env var, so
we force CPU through jax.config before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

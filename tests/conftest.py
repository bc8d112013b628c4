"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding logic (DP/TP pjit paths) is exercised without TPUs via
XLA's host-platform device-count override, per SURVEY.md §4's test strategy.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

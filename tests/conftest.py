"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding logic (DP/TP pjit paths) is exercised without TPUs via
XLA's host-platform device-count override, per SURVEY.md §4's test strategy.

Note: some environment plugin may import jax before this conftest runs, so
setting os.environ alone is not reliable — we also force the platform through
jax.config, which takes effect as long as no backend has been *used* yet.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.default_backend()}"
    )
    assert len(jax.devices()) == 8, jax.devices()

"""Test session setup.

Tests run on CPU with 8 virtual XLA host devices (SURVEY §4.4: the standard
JAX trick for exercising pjit/mesh code without a TPU pod) with fp32
numerics for parity against the torch CPU reference.

Note: this environment's sitecustomize registers an experimental TPU
backend and forces ``jax_platforms="axon,cpu"`` at interpreter startup, so
the ``JAX_PLATFORMS`` env var alone is not enough — we must override the
config *after* import, before any backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running tests (interpret-mode Pallas kernels, "
        "multi-process simulations, full-published-shape conversions); "
        "deselect with `-m 'not slow'` for the fast core",
    )

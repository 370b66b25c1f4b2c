"""Test configuration: force an 8-device CPU mesh and float64.

The environment's sitecustomize may import jax and register a TPU
plugin before pytest loads this file, so setting env vars is not
enough — use jax.config.update, which takes effect as long as no
backend has been initialized yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    # fail fast if a TPU/axon backend sneaks in
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) >= 8, jax.devices()

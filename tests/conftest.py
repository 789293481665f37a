"""Test harness: run everything on a virtual 8-device CPU platform.

Must set env before jax is imported anywhere (SURVEY §4: the build's test
pyramid replaces the reference's absent test suite).
"""

import os

# NOTE: this image preloads a TPU PJRT plugin via sitecustomize, importing
# jax before conftest runs — env vars alone are too late. config.update
# still wins because backends initialize lazily.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

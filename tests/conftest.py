"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh
(`xla_force_host_platform_device_count=8`), the pattern SURVEY.md §4
prescribes since multi-chip TPU hardware is unavailable here.

Note: this environment's sitecustomize registers a remote TPU ("axon")
backend and overrides `jax_platforms` *after* env vars are read, so the CPU
pin must happen via `jax.config.update` post-import, not via JAX_PLATFORMS.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()

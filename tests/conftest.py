"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Per SURVEY.md §4 ("Distributed tests without a cluster"): only one real TPU
chip exists locally, so distributed/sharding behavior is validated on the CPU
backend with 8 virtual devices.

Note: this machine's sitecustomize imports jax and registers the axon TPU
plugin before pytest starts, so ``JAX_PLATFORMS=cpu`` in the environment is
read too late — the platform must be forced via ``jax.config.update``. The
XLA_FLAGS device-count flag still works because backends initialize lazily.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

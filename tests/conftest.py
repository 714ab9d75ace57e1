"""Test configuration: force an 8-device virtual CPU mesh.

The container's sitecustomize pre-registers the remote axon TPU backend and
overrides JAX_PLATFORMS, so plain env vars are not enough — we must both set
XLA_FLAGS before the CPU client initializes AND flip jax_platforms after
import. This emulates a multi-chip TPU slice on CPU so sharding/collective
tests run hermetically without hardware.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
assert jax.default_backend() == "cpu", jax.default_backend()

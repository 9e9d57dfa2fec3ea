"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding logic is exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize registers the remote "axon" TPU backend
# regardless of JAX_PLATFORMS; force the virtual-device CPU platform
# explicitly so the suite never compiles over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require TPU hardware; sharding/mesh tests exercise the same
pjit/shard_map code paths on host devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even when a TPU is attached
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may pre-import jax with an accelerator platform pinned
# (sitecustomize); config.update still wins if no backend is initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers the axon TPU platform at
interpreter start (JAX_PLATFORMS=axon in the env), so plain env-var
defaults are not enough: we override the platform list after import and
set the virtual device count before the CPU backend initializes. This
gives every test 8 CPU devices for multi-chip sharding validation
(SURVEY.md section 4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

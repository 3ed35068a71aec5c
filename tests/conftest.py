"""Test config: run JAX on a virtual 8-device CPU mesh.

The environment registers a TPU ('axon') PJRT plugin via sitecustomize and
imports jax at interpreter start, so env vars alone are too late — we force
the platform through jax.config before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding code
paths are exercised without TPU hardware (the driver separately dry-runs the
multichip path). Set platform/flags BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may import jax (registering a TPU plugin)
# before this file runs, making the env vars above ineffective. Force the
# platform through the config API as well, before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

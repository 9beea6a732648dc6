"""Test harness configuration.

Forces JAX onto an 8-device virtual CPU mesh so every multi-chip sharding
path is exercised without TPU hardware (the TPU-world answer to
"multi-node tests without a cluster", SURVEY.md §4).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment force-registers a remote TPU backend (axon) via
# sitecustomize before conftest runs; a plain JAX_PLATFORMS env var is
# overridden by that registration, so force CPU through the config API
# before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

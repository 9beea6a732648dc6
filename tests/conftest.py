"""Test harness configuration.

Forces JAX onto an 8-device virtual CPU mesh so every multi-chip sharding
path is exercised without TPU hardware (the TPU-world answer to
"multi-node tests without a cluster", SURVEY.md §4).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

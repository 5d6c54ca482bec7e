"""Test env: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding tests run on `--xla_force_host_platform_device_count=8`
CPU devices (the fake-backend capability the reference lacks, SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so sharding/multi-chip
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; the bench runs on the real chip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so sharding/multi-chip
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; the bench runs on the real chip).
"""

import os

# Force CPU: the harness shell exports JAX_PLATFORMS=axon (the TPU tunnel),
# but tests must be deterministic, multi-device, and off the tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so sharding/multi-chip
paths are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; the bench runs on the real chip).

The environment may install a sitecustomize hook (PYTHONPATH site dir) that
registers and eagerly *initializes* the TPU-tunnel PJRT backend at interpreter
startup — before this conftest runs. Env vars (JAX_PLATFORMS / XLA_FLAGS) are
too late at that point: XLA_FLAGS is parsed once at startup and the memoized
``get_backend`` already holds the tunnel client. So this conftest tears the
initialized backends down and re-selects CPU via jax.config, using
``jax_num_cpu_devices`` (passed explicitly at CPU-client creation, so it works
even though XLA_FLAGS was already consumed).
"""

import os

# Still set the env for any subprocesses tests may spawn.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

N_VIRTUAL_DEVICES = 8


def _force_cpu_devices() -> None:
    # Public teardown API (jax.extend.backend.clear_backends discards any
    # eagerly-initialized clients and their memoized lookup); the config
    # updates then steer the re-initialization to n virtual CPU devices.
    import jax.extend.backend

    jax.extend.backend.clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_VIRTUAL_DEVICES)


_force_cpu_devices()
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == N_VIRTUAL_DEVICES, jax.devices()

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's approach of testing multi-rank logic without a
cluster via pace.util.testing.DummyComm (reference:
external/fv3fit/fv3fit/_shared/halos.py:10-19) — here JAX's host-platform
device-count override provides 8 virtual CPU devices for sharding tests.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

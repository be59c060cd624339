"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Note: the hosted TPU plugin rewrites jax_platforms to "axon,cpu" at import
time, overriding JAX_PLATFORMS from the environment — so we must also
override via jax.config.update after importing jax (before any backend
initialization).
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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

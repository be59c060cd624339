"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Note: the hosted TPU plugin rewrites jax_platforms to "axon,cpu" at import
time, overriding JAX_PLATFORMS from the environment — so we must also
override via jax.config.update after importing jax (before any backend
initialization).
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The XLA:CPU AOT cache loader logs spurious machine-feature-mismatch
# errors (prefer-no-scatter/gather are compiler preferences, not host
# features) on every cache hit; silence C++ logging below FATAL.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compile time dominates the suite on a
# 1-core host (a cold run is ~6x a warm one). Keyed on jax version +
# HLO + compile options, so stale entries are never reused.
_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache", "tests",
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

# Build the native preprocessing library on first collection in a fresh
# checkout (the .so is a build artifact, not committed) so the native
# parity tests never silently skip out of the suite.
_NATIVE = os.path.normpath(os.path.join(os.path.dirname(__file__), "..", "native"))
if not os.path.exists(os.path.join(_NATIVE, "libacfm_preproc.so")):
    import subprocess

    subprocess.run(
        ["sh", os.path.join(_NATIVE, "build.sh")], check=False, capture_output=True
    )

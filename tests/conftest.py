"""Test environment: force CPU with 8 virtual devices for sharding tests.

Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the (single-chip,
# tunneled, slow-compile) TPU platform; tests run on an 8-device virtual CPU
# mesh instead (real-TPU execution is exercised by bench.py).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# This jaxlib's CPU backend compiles tiny executables slowly (~10s for the
# first op-by-op eval); a persistent cache makes repeat test runs cheap.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

# On this jaxlib neither the JAX_PLATFORMS env var nor the XLA_FLAGS
# host-device-count flag is honored (the tunneled TPU plugin wins); the config
# knobs are. Must happen before the backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

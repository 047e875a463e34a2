"""Test configuration: run JAX on CPU with 8 virtual devices so sharding
tests exercise real multi-device code paths without TPU hardware (the driver
validates the true multi-chip path separately via __graft_entry__).

Note: this image pins JAX_PLATFORMS=axon (a tunneled TPU) in the environment
and the plugin re-asserts it, so we must force CPU via jax.config, not env.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compile time of
# the big-integer kernels (exp chains, NTT stages), which are identical across
# runs. Cache them on disk so repeat runs are fast.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

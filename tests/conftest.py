"""Test configuration: force the CPU backend with 8 virtual devices.

The standard way to exercise mesh/collective code without a TPU pod
(SURVEY.md §4): 8 host-platform devices + JAX_PLATFORMS=cpu. The axon TPU
tunnel in this environment ignores the env var, so we set the config flag
directly before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: repeat test runs skip XLA recompiles.
_CACHE_DIR = os.environ.get("ISEG_JIT_CACHE", "/tmp/iseg_jit_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Must set env vars before jax is imported anywhere. The driver separately
compile-checks the TPU path (`__graft_entry__.py`) on real hardware.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The axon TPU plugin overrides JAX_PLATFORMS at registration, so the env
# var alone is not enough -- force the CPU backend via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

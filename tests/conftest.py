"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Must set env vars before jax is imported anywhere. The driver separately
compile-checks the TPU path (`__graft_entry__.py`) on real hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

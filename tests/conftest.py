"""Test configuration: run everything on CPU with an 8-device virtual mesh.

Must set env vars before jax is imported anywhere. The driver separately
compile-checks the TPU path (`__graft_entry__.py`) on real hardware.

Set STARK_TPU_TEST_TPU=1 to keep the real TPU backend instead (for the
TPU-only differential suites `test_pallas*.py`):

    STARK_TPU_TEST_TPU=1 python -m pytest tests/test_pallas_protocol.py
"""

import os

_TPU = os.environ.get("STARK_TPU_TEST_TPU") == "1"

_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU and "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The axon TPU plugin overrides JAX_PLATFORMS at registration, so the env
# var alone is not enough -- force the CPU backend via config.
if not _TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_stark"))
# GPU-only XLA cache paths would otherwise be derived from the
# cache dir and folded into every cache KEY, making cached
# executables non-portable across cache locations (cache-pack)
jax.config.update("jax_persistent_cache_enable_xla_caches", "")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

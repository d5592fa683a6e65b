"""Test configuration: force an 8-virtual-device CPU mesh.

Tests run on CPU (full-precision f64, deterministic) with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware.  The real
TPU path is exercised by bench.py / __graft_entry__.py.

Must run before any jax client initialization: pytest imports conftest first,
and the flags below are applied before the backend is instantiated.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-heavy (~190 jitted
# kernels); warm runs drop from >10 min to minutes.
_cache_dir = os.path.expanduser("~/.cache/outfit_tpu/jax_cache")
os.makedirs(_cache_dir, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # default policy caches TPU/GPU only; tests run on CPU
    jax.config.update(
        "jax_persistent_cache_enable_xla_caches", "xla_gpu_per_fusion_autotune_cache_dir"
    )
except Exception:
    pass

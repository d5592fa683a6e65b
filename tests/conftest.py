"""Test configuration: force an 8-virtual-device CPU mesh.

Tests run on CPU (full-precision f64, deterministic) with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware.  The real
TPU path is exercised by bench.py / __graft_entry__.py.

Must run before any jax client initialization: pytest imports conftest first,
and the flags below are applied before the backend is instantiated.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# hermetic suite: no opportunistic catalog/ephemeris downloads mid-test
os.environ.setdefault("OUTFIT_NO_DOWNLOAD", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-heavy (~190 jitted
# kernels); warm runs drop from >10 min to minutes.  Keyed by a host-CPU
# fingerprint: another machine's XLA:CPU AOT artifacts can SIGILL this one
# (utils/compile_cache.py).
from outfit_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache(min_compile_secs=0.5)
try:
    # default policy caches TPU/GPU only; tests run on CPU
    jax.config.update(
        "jax_persistent_cache_enable_xla_caches", "xla_gpu_per_fusion_autotune_cache_dir"
    )
except Exception:
    pass


# --- memory-mapping guard -----------------------------------------------
# Every live XLA:CPU executable holds dozens of memory mappings (JIT code
# pages).  The suite compiles/deserializes hundreds of 8-device executables,
# and the process crosses the kernel's vm.max_map_count (default 65530)
# about 70% of the way through — at which point an mmap failure inside
# executable deserialization segfaults/aborts the whole run (observed as
# deterministic rc=139/rc=134 at the same test).  Dropping compiled
# executables bounds the live set; the persistent compile cache makes the
# subsequent reloads cheap.

from outfit_tpu.utils.runtime import clear_executables_if_crowded  # noqa: E402


def pytest_runtest_teardown(item, nextitem):
    clear_executables_if_crowded()

"""Long-running-process runtime guards.

Every live XLA:CPU executable holds dozens of memory mappings (JIT code
pages).  A process that keeps compiling/deserializing new executables —
a test suite, or a service fitting ever-new dataset shapes — eventually
crosses the kernel's ``vm.max_map_count`` (default 65530), at which point
an mmap failure *inside* XLA crashes the process (SIGSEGV/SIGABRT) rather
than raising.  The fit pipelines bound their shape set by bucketing, so
steady-state services plateau; this guard is the backstop for workloads
that do not (e.g. unbucketed ad-hoc shapes, very wide test matrices).

``jax.clear_caches()`` drops live executables; with the persistent compile
cache enabled (utils/compile_cache.py) the subsequent reloads are cheap.
"""

from __future__ import annotations


def memory_map_count() -> int:
    """Number of memory mappings held by this process (Linux; 0 elsewhere)."""
    try:
        with open("/proc/self/maps", "rb") as f:
            return f.read().count(b"\n")
    except OSError:
        return 0


def clear_executables_if_crowded(soft_limit: int = 30_000) -> bool:
    """Drop compiled executables when the process nears ``vm.max_map_count``.

    Call periodically from long-running loops (once per batch is plenty:
    the check is one /proc read).  Returns True if caches were cleared.
    """
    if memory_map_count() <= soft_limit:
        return False
    import jax

    jax.clear_caches()
    return True

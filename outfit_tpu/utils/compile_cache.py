"""Persistent XLA compile-cache setup, keyed by a host fingerprint.

The cache home (``~/.cache/outfit_tpu``) can be shared between machines
(network home dirs, container images, the driver's bench host vs the build
host).  XLA:CPU caches AOT executables compiled against the *build* host's
CPU feature set; loading them on a host missing those features logs
"could lead to execution errors such as SIGILL" and can crash.  Keying the
cache directory by a digest of the host's CPU model + feature flags keeps
each machine's artifacts separate while still sharing across processes on
the same machine.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    """Short digest of the CPU identity (machine arch + model + flags)."""
    parts = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    parts.append(line.strip())
                    if len(parts) >= 3:
                        break
    except OSError:
        parts.append(platform.processor() or "unknown")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:10]


def enable_compile_cache(
    subdir: str = "jax_cache",
    min_compile_secs: float = 1.0,
    fingerprint: bool | None = None,
):
    """Point JAX's persistent compilation cache at a per-backend directory.

    ``fingerprint=None`` (auto) applies the host key only when the default
    backend is CPU — TPU executables are host-independent, and re-keying
    the TPU cache would discard minutes of tunnel-compiled artifacts for
    no robustness gain.  Auto mode initializes the JAX backend; pass an
    explicit bool to avoid that.  Silently a no-op if the running JAX
    rejects the config keys.
    """
    import jax

    if fingerprint is None:
        try:
            fingerprint = jax.default_backend() == "cpu"
        except Exception:
            fingerprint = True  # unknown backend: fail safe
    d = os.path.expanduser(f"~/.cache/outfit_tpu/{subdir}")
    if fingerprint:
        d += f"-{_host_fingerprint()}"
    os.makedirs(d, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:
        pass
    return d

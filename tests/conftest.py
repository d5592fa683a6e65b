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

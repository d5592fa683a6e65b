"""Shared numerical utilities."""

from outfit_tpu.utils.linalg import cholesky6, cholesky_inverse6  # noqa: F401
from outfit_tpu.utils.runtime import (  # noqa: F401
    clear_executables_if_crowded,
    memory_map_count,
)

"""Shared numerical utilities."""

from outfit_tpu.utils.linalg import cholesky6, cholesky_inverse6  # noqa: F401
